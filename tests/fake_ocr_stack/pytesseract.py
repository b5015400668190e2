"""Fake pytesseract for exercising the real OCR decode path without the
binary (VERDICT r2 #5): deterministic word boxes / text decoded from the
fake image's embedded JSON. Mirrors the parts of the public pytesseract API
that ``tokenize_tesseract`` consumes (Output.DICT, image_to_data,
image_to_string). Ships to Spark workers via PYTHONPATH, not sys.modules
hacks, so the mapInPandas bodies run for real."""


class Output:
    DICT = "dict"


def image_to_data(img, output_type=None, lang=None, config=None):
    # the production code must grayscale-normalize BEFORE OCR (P3,
    # reference process_queue_documents.py:35-37) — fail the job if not
    assert getattr(img, "mode", None) == "L", \
        "image_to_data called on a non-grayscale image (P3 violated)"
    assert output_type == Output.DICT
    words = img.data.get("words", [])
    return {
        "left": [w[0] for w in words],
        "top": [w[1] for w in words],
        "width": [w[2] for w in words],
        "height": [w[3] for w in words],
        "text": [w[4] for w in words],
        "conf": ["96"] * len(words),
    }


def image_to_string(img, lang=None, config=None):
    assert getattr(img, "mode", None) == "L"
    # surface the mode parameters in the output so the test can assert the
    # TESSERACT_MODES config mapping reached the call
    return img.data.get("text", "") + f"\n[mode {lang}|{config}]"
