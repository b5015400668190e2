"""Fake PIL package (see pytesseract.py in this directory)."""
from . import Image  # noqa: F401
