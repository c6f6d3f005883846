"""Per-fixture configs reproducing the reference test harness options
(/root/reference/test/index.test.js:22-28,122-128,304-306,522-543).

Most fixtures run without a media handler (image URLs pass through
verbatim); ``images`` and ``image-large`` run with media upload enabled
against the content-addressed 300.png / large.png stand-ins.
"""

# reference-pinned constants live in ONE place (the package registry);
# this module only derives the tier-1 callable-lookup view of them
from helix_html2md_spark.sources.fixtures import (  # noqa: F401
    HASH_300, HASH_LARGE, SIZE_LARGE_24M, SIZE_LARGE_25M,
)


def _images_lookup(url: str):
    m = {
        "https://images.dummy.com/300.png": dict(hash=HASH_300, width=300, height=300, ext="png"),
        "https://www.example.com/absolute.png": dict(hash=HASH_300, width=300, height=300, ext="png"),
        "https://www.example.com/blog/relative.png": dict(hash=HASH_300, width=300, height=300, ext="png"),
        "https://www.example.com/adobe/assets/urn:aaid:aem:abcd": dict(
            hash=HASH_300, width=300, height=300, ext="png"),
        "https://www.example.com/meta-image.png": dict(hash=HASH_300, width=300, height=300, ext="png"),
    }
    return m.get(url)


def _large_lookup(url: str):
    if url == "https://www.example.com/large.png":
        return dict(hash=HASH_LARGE, width=0, height=0, ext="png")
    return None


def _large_err_lookup(url: str):
    if url == "https://www.example.com/large.png":
        return dict(hash=HASH_LARGE, width=0, height=0, ext="png", size=SIZE_LARGE_25M)
    if url == "https://www.example.com/large1.png":
        return dict(hash=HASH_LARGE, width=0, height=0, ext="png", size=SIZE_LARGE_24M)
    return None


CONFIGS = {
    "unspread": {"unspread_lists": True},
    "images": {
        "media_enabled": True,
        "media_lookup": _images_lookup,
        "source_url": "https://www.example.com/blog/article",
        "org": "owner",
        "site": "repo",
    },
    "image-large": {
        "media_enabled": True,
        "media_lookup": _large_lookup,
        "source_url": "https://www.example.com/",
        "org": "owner",
        "site": "repo",
        # test raises maxImageSize so upload succeeds (index.test.js:522-543)
        "max_image_size": 100 * 1024 * 1024,
    },
    "images-large": {
        "media_enabled": True,
        "media_lookup": _large_err_lookup,
        "source_url": "https://www.example.com/",
        "org": "owner",
        "site": "repo",
    },
    "external-assets": {
        "external_prefixes": ["https://example.com/adobe/assets/"],
    },
}

# fixtures that raise instead of producing markdown
ERROR_FIXTURES = {
    "json-ld-invalid": ("ConstraintsError", "invalid json-ld"),
    "json-ld-too-large": ("ConstraintsError", None),
    "images-large": ("SizeTooLargeError", "Images 1 and 2 exceed allowed limit of 20.00MB"),
}
