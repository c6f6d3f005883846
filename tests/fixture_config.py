"""Per-fixture configs reproducing the reference test harness options
(/root/reference/test/index.test.js:22-28,122-128,304-306,522-543).

Most fixtures run without a media handler (image URLs pass through
verbatim); ``images`` and ``image-large`` run with media upload enabled
against the content-addressed 300.png / large.png stand-ins.
"""

# sha1 of test/fixtures/300.png (test/index.test.js:123)
HASH_300 = "c2e2c6c049ccf4b583431e14919687f3a39cc227"
# sha1 of the large test buffer (test/index.test.js:545-560)
HASH_LARGE = "20b6669c77e35fb2ad9563a4a048701b43948bd3"


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
        return dict(hash=HASH_LARGE, width=0, height=0, ext="png", size=25 * 1025 * 1024)
    if url == "https://www.example.com/large1.png":
        return dict(hash=HASH_LARGE, width=0, height=0, ext="png", size=24 * 1025 * 1024)
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
