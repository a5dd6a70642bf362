import numpy as np

from hevc_tpu.core import tables


def test_dct4_matches_spec():
    t4 = tables.dct_matrix(4)
    expect = np.array([[64, 64, 64, 64],
                       [83, 36, -36, -83],
                       [64, -64, -64, 64],
                       [36, -83, 83, -36]])
    assert (t4 == expect).all()


def test_dct8_odd_rows():
    t8 = tables.dct_matrix(8)
    assert list(t8[1]) == [89, 75, 50, 18, -18, -50, -75, -89]
    assert list(t8[3]) == [75, -18, -89, -50, 50, 89, 18, -75]
    assert list(t8[5]) == [50, -89, 18, 75, -75, -18, 89, -50]
    assert list(t8[7]) == [18, -50, 75, -89, 89, -75, 50, -18]


def test_dct_even_row_recursion():
    # T_{2N}[2k][0:N] == T_N[k] for all sizes — the defining recursion.
    for n in (4, 8, 16):
        t = tables.dct_matrix(n)
        t2 = tables.dct_matrix(2 * n)
        assert (t2[::2, :n] == t).all()


def test_dct_near_orthogonal():
    for n in (4, 8, 16, 32):
        t = tables.dct_matrix(n).astype(np.int64)
        g = t @ t.T
        diag = np.diag(g)
        # Spec matrices have row norms within 0.2% of 64^2 * n.
        assert np.all(np.abs(diag - 4096 * n) <= 0.002 * 4096 * n)
        off = np.abs(g - np.diag(diag)).max()
        assert off <= 450  # tuned-integer matrices are not exactly orthogonal


def test_dst4():
    # DST-VII basis antisymmetry relations from the spec table.
    d = tables.DST4
    assert list(d[0]) == [29, 55, 74, 84]
    assert list(d[1]) == [74, 74, 0, -74]


def test_diag_scan_4x4():
    s = tables.diag_scan(4)
    # Up-right diagonal: (0,0),(0,1),(1,0),(0,2),(1,1),(2,0),...
    expect_head = [(0, 0), (0, 1), (1, 0), (0, 2), (1, 1), (2, 0)]
    assert [tuple(p) for p in s[:6]] == expect_head
    assert len(s) == 16


def test_coeff_scan_cover_all():
    for log2 in (2, 3, 4, 5):
        for scan in (0, 1, 2):
            if log2 > 3 and scan != 0:
                continue  # hor/ver only used for 4x4/8x8 intra
            idx = tables.coeff_scan(log2, scan)
            assert sorted(idx) == list(range((1 << log2) ** 2))


def test_chroma_qp_map():
    assert tables.chroma_qp(17, 1) == 17
    assert tables.chroma_qp(30, 1) == 29
    assert tables.chroma_qp(39, 1) == 35
    assert tables.chroma_qp(43, 1) == 37
    assert tables.chroma_qp(51, 1) == 45
    assert tables.chroma_qp(57, 1) == 51


def test_intra_angles():
    assert tables.intra_angle(26) == 0   # pure vertical
    assert tables.intra_angle(10) == 0   # pure horizontal
    assert tables.intra_angle(2) == 32
    assert tables.intra_angle(34) == 32
    assert tables.intra_inv_angle(18) == -256
    assert tables.intra_inv_angle(11) == -4096
    assert tables.intra_inv_angle(25) == -4096
