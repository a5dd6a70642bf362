#!/bin/bash
# Build the reference HM-16.4 encoder/decoder binaries OUT OF TREE (in /tmp)
# to serve as a test oracle (conformance decoder) and performance baseline
# (single-thread CPU encoder). The reference tree at /root/reference is
# read-only; we copy it to /tmp/hm_oracle and build there. Nothing from the
# reference is committed to this repository.
#
# Outputs:
#   /tmp/hm_oracle/bin/TAppEncoderStatic   (reference encoder, CPU mode)
#   /tmp/hm_oracle/bin/TAppDecoderStatic   (reference decoder = conformance oracle)
set -e
ORACLE=/tmp/hm_oracle
if [ -x "$ORACLE/bin/TAppDecoderStatic" ] && [ -x "$ORACLE/bin/TAppEncoderStatic" ]; then
  echo "oracle already built at $ORACLE/bin"
  exit 0
fi
rm -rf "$ORACLE"
mkdir -p "$ORACLE"
cp -r /root/reference/source /root/reference/build /root/reference/cfg /root/reference/cl "$ORACLE/"
mkdir -p "$ORACLE/lib" "$ORACLE/bin" "$ORACLE/stub"
# Newer g++ emits warnings HM-16.4 didn't have; drop -Werror in the copy.
sed -i 's/ -Werror//' "$ORACLE/build/linux/common/makefile.base"
# -lOpenCL needs the dev symlink; point it at the system ICD loader.
ln -sf /lib/x86_64-linux-gnu/libOpenCL.so.1 "$ORACLE/stub/libOpenCL.so"
cd "$ORACLE/build/linux"
# makefile.base uses plain g++; LIBRARY_PATH points the -lOpenCL link at
# the stub symlink (system ICD loader).
LIBRARY_PATH="$ORACLE/stub" make release -j"$(nproc)" 2>&1 | tail -5
ls -la "$ORACLE/bin/"
