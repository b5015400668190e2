"""Fake PIL.Image: a deterministic stand-in whose pixels are a JSON payload
``{"w", "h", "bands", "words", "text"}`` — enough surface (open / convert /
resize / save / width / height / getbands) for decode_image, resize_image
and tokenize_tesseract to run their real post-import-guard bodies."""

import json


class FakeImage:
    def __init__(self, data, mode=None, width=None, height=None):
        self.data = data
        self.mode = mode if mode is not None else data.get("bands", "RGB")
        self.width = width if width is not None else int(data["w"])
        self.height = height if height is not None else int(data["h"])

    def convert(self, mode):
        return FakeImage(self.data, mode=mode,
                         width=self.width, height=self.height)

    def resize(self, size):
        w, h = size
        return FakeImage(self.data, mode=self.mode, width=int(w), height=int(h))

    def getbands(self):
        return tuple(self.data.get("bands", "RGB"))

    def save(self, fp, format=None):
        fp.write(f"FAKE{format}:{self.width}x{self.height}".encode())


def open(fp):  # noqa: A001 - mirrors PIL.Image.open
    return FakeImage(json.loads(fp.read().decode()))
