"""Fake qreader: detections come from the payload's embedded JSON ``qr``
list, shaped exactly like the public QReader.detect return (a list of dicts
with 'bbox_xyxy'), so detect_qr's real body parses real structure."""

import json


class QReader:
    def detect(self, image=None):
        data = json.loads(bytes(image).decode())
        return [{"bbox_xyxy": tuple(b)} for b in data.get("qr", [])]
