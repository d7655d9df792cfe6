"""Parity proof for the one-pass streaming extractor (_StreamExtract):
its (text, links, meta) must be byte-identical to the tree pipeline
(_parse + doc_text / doc_links / doc_meta) that the golden oracle keeps
using — any divergence here is a correctness bug in the fetch kernel,
not an acceptable speed/semantics trade."""

from __future__ import annotations

from wormpy_spark.functions.extract import (
    _parse,
    assemble_meta,
    doc_links,
    doc_meta,
    doc_text,
    extract_all,
)
from wormpy_spark.functions.urlnorm import resolve_link

URL = "https://host0.test/p/7?x=1"
CTYPE = "text/html"


def both(html: str):
    root = _parse(html)
    tree = (
        doc_text(root),
        doc_links(root, URL),
        doc_meta(root, CTYPE, URL),
    )
    text, hrefs, body_meta = extract_all(html)
    stream = (
        text,
        {resolve_link(URL, h) for h in hrefs},
        assemble_meta(body_meta, CTYPE, URL),
    )
    return tree, stream


def assert_parity(html: str):
    tree, stream = both(html)
    assert stream[0] == tree[0], f"text diverged for {html[:120]!r}"
    assert stream[1] == tree[1], f"links diverged for {html[:120]!r}"
    assert stream[2] == tree[2], f"meta diverged for {html[:120]!r}"


ADVERSARIAL = [
    "",
    "plain text only",
    "<p>a<p>b<p>c",                                    # implied closes
    "<div><span>x</div>y</span>z",                     # mis-nesting
    "<script>var a = '<div>not a tag</div>';</script>visible",
    "<style>.x{display:none}</style>shown",
    "<nav>menu</nav><header>h</header><footer>f</footer><aside>s</aside>body",
    '<div style="display:none">hidden</div><div style="color:red">red</div>',
    '<div class="is-hidden">h</div><div class="visible">v</div>',
    '<a href="/rel">r</a><a href="https://other.test/x">abs</a><a>nohref</a>',
    '<a href="/dup">1</a><a href="/dup">2</a>',        # duplicate hrefs
    '<a href>bare</a>',                                # bare href attr
    '<A HREF="/UPPER">case</A>',
    '<meta name="Desc" content="d"><meta property="og:title" content="t">',
    '<meta name="dup" content="a"><meta name="dup" content="b">',
    '<meta name="url" content="override"><meta name="title" content="mt">',
    "<title>first</title><title>second</title>",
    "<header><title>in dropped ancestor</title></header>",
    "<title>be<nav>dropped-inside</nav>fore</title>",
    "<title>unclosed title rest of doc",
    '<script type="application/ld+json">{"b":2,"a":1}</script>',
    '<script type="application/ld+json">not json</script>',
    '<script type="application/ld+json">{"x":1}</script>'
    '<script type="application/ld+json">{"y":2}</script>',
    '<script type="application/ld+json"/>',            # self-closing
    "<br><hr><img src=x class=hidden><input value=v>",  # void elements
    "<div/>self<span/>closing",
    "a &amp; b &lt;tag&gt; &#65; &unknown;",           # charrefs
    '<a href="/x?a=1&amp;b=2">entity in attr</a>',
    "<!-- comment --><div>after<!-- c2 --></div>",
    "<![CDATA[raw]]><div>x</div>",
    "<!DOCTYPE html><html><body>doc</body></html>",
    "text<div>interleaved</div>tail",
    "<p>multi\n\n\n  line   \n\ttext</p>",
    "< notatag <<>> <a href='/q'>q</a>",
    "<div title='<a href=\"/fake\">'>attr-tag</div>",
    "<ul><li>one<li>two<li>three</ul>",
    "<table><tr><td>c1<td>c2<tr><td>c3</table>",
    "é中文<div>\U0001f600</div>",
    '<script type="application/ld+json">{"t":1}</script>'
    "<title>late title</title>",
    "<div><div><div><div><div>deep</div></div></div></div></div>" * 20,
]


def test_adversarial_cases():
    for html in ADVERSARIAL:
        assert_parity(html)


def test_fixture_corpus_parity():
    """Every HTML body the deterministic fixture corpus generates
    (static + dynamic variants) extracts identically on both paths."""
    from wormpy_spark.fixtures.webgen import generate_corpus

    corpus = generate_corpus()
    web = corpus["web"]
    n = 0
    for col in ("body", "dynamic_body"):
        if col not in web.columns:
            continue
        for v in web[col]:
            if v is None:
                continue
            html = v if isinstance(v, str) else bytes(v).decode(
                "utf-8", errors="replace"
            )
            assert_parity(html)
            n += 1
    assert n > 100


def test_random_tag_soup_parity():
    """Seeded random tag soup: malformed nesting, random attrs, random
    drop markers — the streaming extractor must track the tree walk
    through arbitrary garbage."""
    import random

    rng = random.Random(7)
    tags = ["div", "span", "a", "p", "nav", "script", "title", "meta",
            "img", "section", "header", "b"]
    frags = []
    for _ in range(400):
        t = rng.choice(tags)
        kind = rng.random()
        attrs = ""
        if rng.random() < 0.4:
            attrs += f' href="/r/{rng.randint(0, 20)}"'
        if rng.random() < 0.2:
            attrs += ' style="display:none"'
        if rng.random() < 0.2:
            attrs += ' class="hidden"'
        if rng.random() < 0.15:
            attrs += f' name="m{rng.randint(0, 5)}" content="c{rng.randint(0, 9)}"'
        if kind < 0.45:
            frags.append(f"<{t}{attrs}>")
        elif kind < 0.75:
            frags.append(f"</{t}>")
        elif kind < 0.85:
            frags.append(f"<{t}{attrs}/>")
        else:
            frags.append(f"text{rng.randint(0, 99)} &amp; more ")
    assert_parity("".join(frags))
