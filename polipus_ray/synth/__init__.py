from .images import decode_image, encode_image, phash64, psnr
from .world import WorldSpec, make_web_table, robots_bodies, seed_urls, write_world

__all__ = [
    "decode_image",
    "encode_image",
    "phash64",
    "psnr",
    "WorldSpec",
    "make_web_table",
    "robots_bodies",
    "seed_urls",
    "write_world",
]
