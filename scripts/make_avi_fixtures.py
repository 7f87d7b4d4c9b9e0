#!/usr/bin/env python3
"""Generate the checked-in AVI fixtures (dev-time only; the library never
runs Python). Layout follows the public RIFF/AVI spec: RIFF('AVI ') →
LIST(hdrl){avih, LIST(strl){strh('vids'/'DIB '), strf(BITMAPINFOHEADER,
24-bit BI_RGB)}} → LIST(movi){'00db' uncompressed bottom-up BGR frames,
rows padded to 4 bytes}. Pixels use B=G=R=v so integer Rec.601 luma == v
exactly — the spec can assert planes in closed form.

avi_a frames use seeds (0, 1, 2); avi_b uses (7, 1, 9): frame 1 is
byte-identical across the two files (the shared-content plant), every
other frame pair differs in most pixels.
"""
import struct, os

W, H = 16, 8
ROW = ((W * 3 + 3) // 4) * 4  # 4-byte aligned BGR rows


def frame(seed: int) -> bytes:
    rows = []
    for y in range(H - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(W):
            v = (x * 17 + y * 31 + seed * 53) % 256
            row += bytes((v, v, v))  # B, G, R
        row += b"\x00" * (ROW - len(row))
        rows.append(bytes(row))
    return b"".join(rows)


def chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def lst(listtype: bytes, body: bytes) -> bytes:
    return chunk(b"LIST", listtype + body)


def avi(seeds) -> bytes:
    frames = [frame(s) for s in seeds]
    avih = struct.pack(
        "<10I", 40000, 0, 0, 0, len(frames), 0, 1, len(frames[0]), W, H
    ) + struct.pack("<4I", 0, 0, 0, 0)
    strh = (b"vids" + b"DIB " +
            struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, 25, 0,
                        len(frames), len(frames[0]), 0, 0) +
            struct.pack("<4H", 0, 0, W, H))
    strf = struct.pack("<IiiHHIIiiII", 40, W, H, 1, 24, 0,
                       ROW * H, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) +
               lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", f) for f in frames))
    return b"RIFF" + struct.pack(
        "<I", 4 + len(hdrl) + len(movi)) + b"AVI " + hdrl + movi


out = os.path.join(os.path.dirname(__file__),
                   "..", "src", "main", "resources", "multimodal")
for name, seeds in (("clip_a.avi", (0, 1, 2)), ("clip_b.avi", (7, 1, 9))):
    with open(os.path.join(out, name), "wb") as f:
        f.write(avi(seeds))
    print(name, "written,", len(avi(seeds)), "bytes")
