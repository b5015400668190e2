"""Regenerate the committed real-OCR fixture (tests/fixtures/realocr/).

Pure stdlib (zlib + struct): a deterministic grayscale PNG of the words in
WORDS rendered with a 5x7 bitmap font, scaled SCALE x, plus expected.json
with the exact decode facts (width/height/bands) and the word list with the
glyph-grid bounding box of each word — the envelope the ``-m realocr`` lane
checks real tesseract output against (tests/test_realocr_binaries.py).

Run: python tests/fixtures/make_realocr_fixture.py
"""

from __future__ import annotations

import json
import os
import struct
import zlib

# 5x7 glyphs, rows top→bottom, 5-bit masks (MSB = leftmost column)
FONT = {
    "A": (0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "B": (0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    "E": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    "M": (0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    "N": (0x11, 0x19, 0x15, 0x13, 0x11, 0x11, 0x11),
    "P": (0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    "R": (0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    "U": (0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "0": (0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    "1": (0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "2": (0x0E, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1F),
    "3": (0x1F, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0E),
    "4": (0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    "5": (0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    " ": (0, 0, 0, 0, 0, 0, 0),
}

WORDS = ["PAN", "NUMBER", "12345"]
SCALE = 10          # glyph pixel → SCALE x SCALE block (tesseract-friendly)
MARGIN = 40         # white border all around
GAP = 2             # glyph columns between words


def render(words: list[str], scale: int, margin: int):
    text = (" " * GAP).join(words)
    cols = len(text) * 6 - 1                      # 5 px glyph + 1 px gap
    rows = 7
    w = cols * scale + 2 * margin
    h = rows * scale + 2 * margin
    pix = bytearray(b"\xff" * (w * h))            # white background
    boxes = []
    x_glyph = 0
    for word in words:
        x0 = margin + x_glyph * 6 * scale
        for ch in word:
            glyph = FONT[ch]
            gx = margin + x_glyph * 6 * scale
            for r in range(7):
                for c in range(5):
                    if glyph[r] >> (4 - c) & 1:
                        for dy in range(scale):
                            y = margin + r * scale + dy
                            xs = gx + c * scale
                            pix[y * w + xs: y * w + xs + scale] = b"\x00" * scale
            x_glyph += 1
        x1 = margin + (x_glyph * 6 - 1) * scale
        boxes.append({"text": word, "x1": x0, "y1": margin,
                      "x2": x1, "y2": margin + 7 * scale})
        x_glyph += GAP
    return w, h, bytes(pix), boxes


def write_png(path: str, w: int, h: int, gray: bytes) -> None:
    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    raw = b"".join(b"\x00" + gray[y * w:(y + 1) * w] for y in range(h))
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw, 9))
           + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def main() -> None:
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "realocr")
    os.makedirs(out_dir, exist_ok=True)
    w, h, gray, boxes = render(WORDS, SCALE, MARGIN)
    write_png(os.path.join(out_dir, "words.png"), w, h, gray)
    with open(os.path.join(out_dir, "expected.json"), "w") as f:
        json.dump({"width": w, "height": h, "bands_grayscale": 1,
                   "words": boxes, "scale": SCALE, "margin": MARGIN}, f,
                  indent=1)
    print(f"wrote {out_dir}/words.png ({w}x{h}) + expected.json")


if __name__ == "__main__":
    main()
