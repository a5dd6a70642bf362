#!/bin/bash
# High-bit-depth HM oracle (RExt__HIGH_BIT_DEPTH_SUPPORT=1) for 14/16-bit
set -e
ORACLE=/tmp/hm_oracle_hbd
if [ -x "$ORACLE/bin/TAppDecoderStatic" ] && [ -x "$ORACLE/bin/TAppEncoderStatic" ]; then
  echo "hbd oracle already built"; exit 0
fi
rm -rf "$ORACLE"
mkdir -p "$ORACLE"
cp -r /root/reference/source /root/reference/build /root/reference/cfg /root/reference/cl "$ORACLE/"
mkdir -p "$ORACLE/lib" "$ORACLE/bin" "$ORACLE/stub"
sed -i 's/ -Werror//' "$ORACLE/build/linux/common/makefile.base"
sed -i 's/#define RExt__HIGH_BIT_DEPTH_SUPPORT                                           0/#define RExt__HIGH_BIT_DEPTH_SUPPORT 1/' "$ORACLE/source/Lib/TLibCommon/TypeDef.h"
grep -n "define RExt__HIGH_BIT_DEPTH_SUPPORT" "$ORACLE/source/Lib/TLibCommon/TypeDef.h" | head -2
ln -sf /lib/x86_64-linux-gnu/libOpenCL.so.1 "$ORACLE/stub/libOpenCL.so"
cd "$ORACLE/build/linux"
LIBRARY_PATH="$ORACLE/stub" make release -j"$(nproc)" 2>&1 | tail -3
ls "$ORACLE/bin/"
