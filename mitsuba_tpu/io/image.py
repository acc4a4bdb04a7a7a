"""Image output (reference: src/libcore/bitmap.cpp writers, films/*).

Formats: PNG/JPG (via PIL, sRGB gamma like ldrfilm.cpp), PFM, NumPy .npy
(mfilm.cpp:84-131 equivalent), and a self-contained uncompressed OpenEXR
writer/reader (hdrfilm.cpp's primary format; no external EXR dependency).
"""
from __future__ import annotations

import struct

import numpy as np


def to_srgb_u8(img: np.ndarray) -> np.ndarray:
    x = np.clip(np.asarray(img, np.float32), 0.0, 1.0)
    srgb = np.where(x <= 0.0031308, 12.92 * x, 1.055 * np.power(x, 1 / 2.4) - 0.055)
    return (srgb * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, img: np.ndarray, gamma: bool = True) -> None:
    from PIL import Image

    arr = to_srgb_u8(img) if gamma else (np.clip(img, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def write_npy(path: str, img: np.ndarray) -> None:
    np.save(path, np.asarray(img, np.float32))


def write_pfm(path: str, img: np.ndarray) -> None:
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    color = img.ndim == 3 and img.shape[2] == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")  # little-endian
        f.write(np.flipud(img).astype("<f4").tobytes())


def read_pfm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        header = f.readline().strip()
        color = header == b"PF"
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(f.read(), "<f4" if scale < 0 else ">f4")
    img = data.reshape(h, w, 3) if color else data.reshape(h, w)
    return np.flipud(img).copy()


# --- minimal OpenEXR (uncompressed, float32, scanline) ---------------------

def _exr_attr(name: bytes, typ: bytes, data: bytes) -> bytes:
    return name + b"\0" + typ + b"\0" + struct.pack("<i", len(data)) + data


def write_exr(path: str, img: np.ndarray, metadata: dict = None) -> None:
    """Write (H, W, 3) float32 as an uncompressed scanline EXR.

    ``metadata``: str->str render annotations embedded as EXR string
    attributes (hdrfilm.cpp:63-135 metadata channel; the reference also
    burns labels into pixels — here labels stay machine-readable)."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = img[..., None].repeat(3, -1)
    chans = b""
    for name in (b"B", b"G", b"R"):  # alphabetical
        chans += name + b"\0" + struct.pack("<iiii", 2, 0, 1, 1)  # FLOAT
    chans += b"\0"
    header = b""
    header += _exr_attr(b"channels", b"chlist", chans)
    header += _exr_attr(b"compression", b"compression", b"\0")  # NONE
    header += _exr_attr(b"dataWindow", b"box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += _exr_attr(b"displayWindow", b"box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += _exr_attr(b"lineOrder", b"lineOrder", b"\0")  # INCREASING_Y
    header += _exr_attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    header += _exr_attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0, 0))
    header += _exr_attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    for k, v in (metadata or {}).items():
        vb = str(v).encode()
        header += _exr_attr(k.encode(), b"string", vb)
    header += b"\0"

    with open(path, "wb") as f:
        f.write(struct.pack("<I", 20000630))  # magic
        f.write(struct.pack("<I", 2))         # version 2, no flags
        f.write(header)
        # scanline offset table
        offset_pos = f.tell()
        data_start = offset_pos + 8 * h
        line_bytes = 4 + 4 + 3 * 4 * w
        for y in range(h):
            f.write(struct.pack("<Q", data_start + y * line_bytes))
        for y in range(h):
            f.write(struct.pack("<i", y))
            f.write(struct.pack("<i", 3 * 4 * w))
            # channel-planar per scanline, alphabetical: B, G, R
            f.write(img[y, :, 2].astype("<f4").tobytes())
            f.write(img[y, :, 1].astype("<f4").tobytes())
            f.write(img[y, :, 0].astype("<f4").tobytes())


def read_exr(path: str) -> np.ndarray:
    """Read back EXRs written by write_exr (uncompressed RGB float32)."""
    with open(path, "rb") as f:
        magic, version = struct.unpack("<II", f.read(8))
        assert magic == 20000630, "not an EXR"
        attrs = {}
        while True:
            name = b""
            c = f.read(1)
            if c == b"\0":
                break
            while c != b"\0":
                name += c
                c = f.read(1)
            typ = b""
            c = f.read(1)
            while c != b"\0":
                typ += c
                c = f.read(1)
            (size,) = struct.unpack("<i", f.read(4))
            attrs[name] = (typ, f.read(size))
        typ, dw = attrs[b"dataWindow"]
        x0, y0, x1, y1 = struct.unpack("<iiii", dw)
        w, h = x1 - x0 + 1, y1 - y0 + 1
        comp = attrs[b"compression"][1][0]
        assert comp == 0, "only uncompressed EXR supported"
        f.read(8 * h)  # offset table
        img = np.zeros((h, w, 3), np.float32)
        for _ in range(h):
            (y,) = struct.unpack("<i", f.read(4))
            (nb,) = struct.unpack("<i", f.read(4))
            row = np.frombuffer(f.read(nb), "<f4").reshape(3, w)
            img[y - y0, :, 2] = row[0]  # B
            img[y - y0, :, 1] = row[1]  # G
            img[y - y0, :, 0] = row[2]  # R
    return img


def write_image(path: str, img: np.ndarray) -> None:
    """Dispatch by extension (Bitmap::write)."""
    p = path.lower()
    if p.endswith(".png") or p.endswith(".jpg") or p.endswith(".jpeg"):
        write_png(path, img)
    elif p.endswith(".pfm"):
        write_pfm(path, img)
    elif p.endswith(".npy"):
        write_npy(path, img)
    elif p.endswith(".exr"):
        write_exr(path, img)
    elif p.endswith(".hdr") or p.endswith(".rgbe"):
        write_rgbe(path, img)
    elif p.endswith(".ppm"):
        write_ppm(path, img)
    elif p.endswith(".tga"):
        write_tga(path, img)
    elif p.endswith(".bmp"):
        write_bmp(path, img)
    elif p.endswith(".m"):
        write_m(path, img)
    else:
        raise ValueError(f"unsupported image format: {path}")


def read_exr_metadata(path: str) -> dict:
    """Parse string attributes back out of an EXR header."""
    import struct as _s
    out = {}
    with open(path, "rb") as f:
        buf = f.read()
    pos = 8
    while buf[pos] != 0:
        e = buf.index(b"\0", pos)
        name = buf[pos:e].decode()
        pos = e + 1
        e = buf.index(b"\0", pos)
        typ = buf[pos:e].decode()
        pos = e + 1
        (n,) = _s.unpack_from("<i", buf, pos)
        pos += 4
        if typ == "string":
            out[name] = buf[pos:pos + n].decode()
        pos += n
    return out


def write_m(path: str, img: np.ndarray, variable: str = "data") -> None:
    """MATLAB/Mathematica-readable matrix dump (mfilm.cpp:84-131 EMATLAB
    mode; the ENumPy mode is write_npy)."""
    img = np.asarray(img)
    with open(path, "w") as f:
        f.write(f"{variable} = [\n")
        if img.ndim == 2:
            img = img[..., None]
        h, w, c = img.shape
        for y in range(h):
            row = ", ".join(
                " ".join(f"{img[y, x, k]:.9g}" for k in range(c))
                for x in range(w)
            )
            f.write("  " + row + (";\n" if y + 1 < h else "\n"))
        f.write("];\n")


def write_rgbe(path: str, img: np.ndarray) -> None:
    """Radiance RGBE (.hdr) writer (bitmap.cpp ERGBE role): shared-exponent
    8-bit mantissas, flat (uncompressed) scanlines."""
    img = np.asarray(img, np.float32)
    h, w, _ = img.shape
    m = img.max(axis=-1)
    e = np.zeros((h, w), np.int32)
    nz = m > 1e-32
    e[nz] = np.ceil(np.log2(m[nz])).astype(np.int32) + 1
    scale = np.where(nz, 256.0 / np.exp2(e.astype(np.float32)), 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(nz, e + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def read_rgbe(path: str) -> np.ndarray:
    """Flat (uncompressed) RGBE reader for files written by write_rgbe."""
    with open(path, "rb") as f:
        data = f.read()
    # header ends at the blank line; the next line is the resolution
    head, _, rest = data.partition(b"\n\n")
    res_line, _, pix = rest.partition(b"\n")
    parts = res_line.split()
    h, w = int(parts[1]), int(parts[3])
    rgbe = np.frombuffer(pix[: h * w * 4], np.uint8).reshape(h, w, 4)
    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e > 0, np.exp2(e - 128 - 8).astype(np.float32), 0.0)
    return rgbe[..., :3].astype(np.float32) * scale[..., None] \
        + np.where(e[..., None] > 0, 0.5, 0.0) * scale[..., None]


def write_ppm(path: str, img: np.ndarray, gamma: bool = True) -> None:
    """Binary PPM (P6) writer with sRGB gamma (bitmap.cpp EPPM role)."""
    img = np.asarray(img, np.float32)
    if gamma:
        img = np.where(img <= 0.0031308, 12.92 * img,
                       1.055 * np.maximum(img, 1e-12) ** (1 / 2.4) - 0.055)
    u8 = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    h, w, _ = u8.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(u8.tobytes())


def write_tga(path: str, img: np.ndarray, gamma: bool = True) -> None:
    """Uncompressed 24-bit TGA writer (bitmap.cpp ETGA role)."""
    from PIL import Image

    img = np.asarray(img, np.float32)
    if gamma:
        img = np.where(img <= 0.0031308, 12.92 * img,
                       1.055 * np.maximum(img, 1e-12) ** (1 / 2.4) - 0.055)
    u8 = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(u8).save(path, format="TGA")


def write_bmp(path: str, img: np.ndarray, gamma: bool = True) -> None:
    """24-bit BMP writer (bitmap.cpp EBMP role)."""
    from PIL import Image

    img = np.asarray(img, np.float32)
    if gamma:
        img = np.where(img <= 0.0031308, 12.92 * img,
                       1.055 * np.maximum(img, 1e-12) ** (1 / 2.4) - 0.055)
    u8 = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(u8).save(path, format="BMP")
