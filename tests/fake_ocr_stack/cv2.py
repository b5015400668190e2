"""Fake cv2: imdecode passes the byte buffer through as the 'image' so the
fake QReader can read the embedded JSON (see pytesseract.py here)."""

IMREAD_COLOR = 1


def imdecode(buf, flags):
    return buf
