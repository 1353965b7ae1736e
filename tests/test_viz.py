import numpy as np

from ltm.utils.viz import jet_colormap, save_range_image_png, write_png


def test_png_roundtrip(tmp_path):
    rgb = (np.random.default_rng(0).uniform(0, 255, size=(20, 30, 3))).astype(np.uint8)
    p = str(tmp_path / "t.png")
    write_png(p, rgb)
    data = open(p, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data and b"IDAT" in data and b"IEND" in data
    # decode back with zlib to verify scanline integrity
    import struct, zlib

    idat_start = data.index(b"IDAT") + 4
    idat_len = struct.unpack(">I", data[data.index(b"IDAT") - 4 : data.index(b"IDAT")])[0]
    raw = zlib.decompress(data[idat_start : idat_start + idat_len])
    assert len(raw) == 20 * (1 + 30 * 3)
    row0 = np.frombuffer(raw[1 : 1 + 90], np.uint8).reshape(30, 3)
    np.testing.assert_array_equal(row0, rgb[0])


def test_jet_colormap_range():
    c = jet_colormap(np.linspace(0, 1, 11))
    assert c.shape == (11, 3)
    assert c[0, 2] >= 120 and c[0, 0] == 0   # blue end
    assert c[-1, 0] >= 120 and c[-1, 2] == 0  # red end
    assert c[5, 1] == 255                     # green middle


def test_save_range_image(tmp_path):
    img = np.full((25, 90), 10000.0)
    img[5:10, 10:50] = 7.5
    p = str(tmp_path / "r.png")
    save_range_image_png(p, img)
    assert open(p, "rb").read()[:4] == b"\x89PNG"
