"""EXIF UserComment embedding for JPEG/WebP/AVIF infotext.

The reference uses piexif (modules/images.py:592-618); piexif is not in
this image, so the same bytes are built with PIL's Image.Exif writer: the
generation infotext goes into Exif IFD tag 0x9286 (UserComment) with the
EXIF "UNICODE\\0" charset prefix + UTF-16-BE payload, exactly the layout
piexif.helper.UserComment.dump(..., encoding="unicode") produces.
"""

from __future__ import annotations

from PIL import Image

EXIF_IFD = 0x8769
USER_COMMENT = 0x9286


def build_exif_bytes(geninfo: str) -> bytes:
    exif = Image.Exif()
    exif.get_ifd(EXIF_IFD)[USER_COMMENT] = \
        b"UNICODE\x00" + (geninfo or "").encode("utf-16-be")
    return exif.tobytes()


def decode_user_comment(raw: bytes) -> str | None:
    if not isinstance(raw, bytes) or len(raw) < 8:
        return None
    charset, payload = raw[:8], raw[8:]
    if charset.startswith(b"UNICODE"):
        # BOM-less UTF-16; piexif writes BE, some cameras write LE
        try:
            text = payload.decode("utf-16-be")
            if "\x00" in text.rstrip("\x00"):
                text = payload.decode("utf-16-le")
            return text.rstrip("\x00")
        except UnicodeDecodeError:
            return None
    if charset.startswith(b"ASCII") or charset == b"\x00" * 8:
        return payload.decode("ascii", errors="replace").rstrip("\x00")
    return None


def read_user_comment(image: Image.Image) -> str | None:
    try:
        exif = image.getexif()
        raw = exif.get_ifd(EXIF_IFD).get(USER_COMMENT)
    except Exception:
        return None
    return decode_user_comment(raw) if raw is not None else None
