"""Constraint/limits coverage (S25, /root/reference/src/index.js:206-221,
test/index.test.js:360-519): maxImages, maxImageSize, maxHTMLSize."""

import pytest

from helix_html2md_spark.core.html2md import (
    SizeTooLargeError, TooManyImagesError, html2md,
)


def _doc_with_images(n):
    imgs = "".join(f'<img src="/image-{i}.png">' for i in range(n))
    return f"<html><body><main><div>{imgs}</div></main></body></html>"


def test_too_many_images_default_limit():
    with pytest.raises(TooManyImagesError) as ei:
        html2md(_doc_with_images(201), {})
    assert str(ei.value) == "maximum number of images reached: 201 of 200 max."


def test_max_images_raised_limit_ok():
    md = html2md(_doc_with_images(201), {"max_images": 250})
    assert md.count("![]") == 201


def test_exactly_at_limit_ok():
    md = html2md(_doc_with_images(200), {})
    assert md.count("![]") == 200


def test_max_html_size():
    big = "<main><div><p>" + "x" * 2_000_000 + "</p></div></main>"
    with pytest.raises(SizeTooLargeError) as ei:
        html2md(big, {})
    assert "html source larger than 1MB" in str(ei.value)


def test_single_large_image_message():
    def lookup(url):
        return {"hash": "ab" * 20, "width": 0, "height": 0, "ext": "png",
                "size": 21 * 1024 * 1024}

    with pytest.raises(SizeTooLargeError) as ei:
        html2md(
            '<main><div><img src="/large.png"></div></main>',
            {"media_enabled": True, "media_lookup": lookup,
             "source_url": "https://www.example.com/"},
        )
    assert str(ei.value) == "Image 1 exceeds allowed limit of 20.00MB"
