from .png import decode_png, encode_png
from .qimg import decode_qimg, encode_qimg
from .image import decode_image, encode_image, ahash64, psnr

__all__ = [
    "decode_png", "encode_png", "decode_qimg", "encode_qimg",
    "decode_image", "encode_image", "ahash64", "psnr",
]
