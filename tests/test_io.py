import numpy as np
import pytest

from slowflow_tpu.io import (
    read_flo, write_flo, read_edges, write_edges, read_matches, write_matches,
    read_pbm, write_pbm, read_image, write_image,
)


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.normal(size=(7, 5, 2)).astype(np.float32)
    p = tmp_path / "a.flo"
    write_flo(p, flow)
    out = read_flo(p)
    np.testing.assert_array_equal(out, flow)


def test_flo_binary_layout(tmp_path):
    """Byte-level check against the reference writer (io.c:78-96)."""
    flow = np.zeros((2, 3, 2), np.float32)
    flow[0, 1] = (1.5, -2.5)
    p = tmp_path / "b.flo"
    write_flo(p, flow)
    raw = p.read_bytes()
    assert np.frombuffer(raw[:4], np.float32)[0] == np.float32(202021.25)
    assert np.frombuffer(raw[4:12], np.int32).tolist() == [3, 2]
    vals = np.frombuffer(raw[12:], np.float32).reshape(2, 3, 2)
    assert vals[0, 1, 0] == 1.5 and vals[0, 1, 1] == -2.5


def test_flo_bad_magic(tmp_path):
    p = tmp_path / "bad.flo"
    p.write_bytes(b"\x00" * 16)
    with pytest.raises(ValueError):
        read_flo(p)


def test_edges_roundtrip(tmp_path, rng):
    e = rng.random((6, 9)).astype(np.float32)
    p = tmp_path / "edges.dat"
    write_edges(p, e)
    np.testing.assert_array_equal(read_edges(p, 9, 6), e)


def test_matches_roundtrip(tmp_path):
    p = tmp_path / "m.txt"
    p.write_text("1 2 3 4 extra stuff 9\n5.5 6 7 8\n# junk\n")
    m = read_matches(p)
    assert m.shape == (2, 4)
    np.testing.assert_allclose(m[0], [1, 2, 3, 4])
    np.testing.assert_allclose(m[1], [5.5, 6, 7, 8])
    p2 = tmp_path / "m2.txt"
    write_matches(p2, m)
    np.testing.assert_allclose(read_matches(p2), m)


def test_pbm_roundtrip(tmp_path):
    mask = np.zeros((5, 8), np.uint8)
    mask[1, 2] = 255
    mask[4, 7] = 255
    p = tmp_path / "o.pbm"
    write_pbm(p, mask)
    out = read_pbm(p)
    np.testing.assert_array_equal(out, mask)


def test_image_roundtrip_8bit(tmp_path, rng):
    img = (rng.random((4, 6, 3)) * 255).astype(np.uint8)
    p = tmp_path / "img.png"
    write_image(p, img.astype(np.float32))
    out = read_image(p)
    np.testing.assert_array_equal(out, img.astype(np.float32))


def test_image_roundtrip_16bit(tmp_path, rng):
    img = (rng.random((4, 6)) * 65535).astype(np.uint16)
    p = tmp_path / "img16.png"
    write_image(p, img.astype(np.float32), bit16=True)
    out = read_image(p)
    np.testing.assert_array_equal(out, img.astype(np.float32))


def test_flo_error_paths(tmp_path):
    """Corrupt/truncated .flo files fail loudly with the file named
    (io.c:78-96 magic check semantics)."""
    import pytest
    from slowflow_tpu.io import read_flo, write_flo

    bad = tmp_path / "bad.flo"
    bad.write_bytes(b"\x00\x01\x02\x03" + b"\x00" * 32)
    with pytest.raises(ValueError, match="not a .flo"):
        read_flo(bad)

    trunc = tmp_path / "trunc.flo"
    write_flo(trunc, np.zeros((8, 10, 2), np.float32))
    data = trunc.read_bytes()
    trunc.write_bytes(data[: len(data) // 2])
    with pytest.raises(ValueError, match="truncated"):
        read_flo(trunc)

    with pytest.raises(FileNotFoundError):
        read_flo(tmp_path / "missing.flo")
