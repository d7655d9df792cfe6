"""Deterministic synthetic web corpus (FIXTURES.md §2-§5).

The engine's offline "network" : one row per fetchable URL in the
``web`` table; fetching is an equi-join against it (SURVEY.md §2.1-S4).
The graph exercises every reference code path the crawl loop has:

- raw-URL variance (case, trailing slash, query, fragment) → P1
- per-host 3-ary link tree + cross links + duplicate links → J2/O1
- out-of-scope links (other hosts) → P3/P4
- media-extension URLs serving image/* (skipped, scraper.py:81-84) and
  one serving text/html (the fall-through: processed) → P5/P6/P7
- image pages ``/img/{image_id}`` (unsupported content type, F7) whose
  body is real encoded image bytes FK'd into the ``images`` table
- PDF pages → S8/F4 (stubbed extractor, see below)
- dynamic pages: static text < 500 chars triggers the Selenium-model
  path; dynamic_links take precedence (content_processor.py:55)
- transient failures (fail_attempts) → T2; permanent → R2 error rows
- raise_in_loop → R3 error rows
- dangling links (no web row) → connection-error R2 rows
- a ``/sub`` subtree per host for prefix-scope (P4) runs
- sitemap probe/sub-sitemap fixtures incl. unparseable XML → S2/S3
- robots.txt fixtures (north_rule addition) incl. 404 hosts

PDF note: the reference extracts PDF text with PyPDF2 (absent here, and
offline fetch is impossible anyway); fixture "PDFs" carry text between
``BT``/``ET`` markers and both engine and oracle use the same stub
extractor, so parity is by construction and clearly marked.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.urlnorm import normalize_url
from .imagegen import generate_images

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu ocean forest meadow summit valley harbor lantern marble"
).split()


def _filler(rng: np.random.Generator, n_words: int) -> str:
    idx = rng.integers(0, len(_WORDS), size=n_words)
    return " ".join(_WORDS[i] for i in idx)


def _page_html(
    title: str,
    hrefs: list[str],
    filler: str,
    meta_desc: str,
    og_title: str,
    ld_name: str,
    include_title: bool = True,
) -> str:
    anchors = "\n".join(
        f'<a href="{h}">link {i}</a>' for i, h in enumerate(hrefs)
    )
    title_tag = f"<title>{title}</title>" if include_title else ""
    return f"""<html><head>{title_tag}
<meta name="description" content="{meta_desc}">
<meta property="og:title" content="{og_title}">
<script type="application/ld+json">{{"@type": "WebPage", "name": "{ld_name}"}}</script>
</head><body>
<nav><a href="/">home</a></nav>
<header>site header</header>
<div style="display:none">SECRET-HIDDEN-TEXT</div>
<div class="nav-hidden">ALSO-HIDDEN</div>
<p>{filler}</p>
{anchors}
<script>var tracker = 1;</script>
<footer>footer text</footer>
</body></html>"""


def _raw_variant(rng: np.random.Generator, url_norm: str) -> str:
    """A raw form that canonicalizes back to url_norm (P1 exercise)."""
    r = rng.random()
    if r < 0.25:
        return url_norm + "/"
    if r < 0.45:
        return url_norm.replace("https://", "https://").upper().replace(
            "HTTPS://", "https://"
        )
    if r < 0.6:
        return url_norm + "?ref=fixture"
    if r < 0.7:
        return url_norm + "#frag"
    return url_norm


def generate_corpus(
    seed: int = 7,
    n_hosts: int = 3,
    pages_per_host: int = 36,
    n_images_per_host: int = 8,
    skew_host: int | None = None,
    skew_factor: int = 1,
    branching: int = 3,
) -> dict[str, pd.DataFrame]:
    """Returns dict of pandas DataFrames:
    web, images, images_truth, sitemaps, robots, seeds."""
    rng = np.random.Generator(np.random.PCG64(seed))
    web_rows: list[dict] = []
    sitemap_rows: list[dict] = []
    robots_rows: list[dict] = []
    all_images: list[pd.DataFrame] = []
    all_truth: list[pd.DataFrame] = []

    for hi in range(n_hosts):
        host = f"host{hi}.test"
        base = f"https://{host}"
        n_pages = pages_per_host * (skew_factor if hi == skew_host else 1)
        images, truth = generate_images(
            n_images=n_images_per_host,
            seed=seed * 1000 + hi,
            id_prefix=f"img_h{hi}",
        )
        all_images.append(images)
        all_truth.append(truth)

        # --- page universe -------------------------------------------------
        def page_norm(j: int) -> str:
            if j == 0:
                return base
            if j % 5 == 4:
                return f"{base}/sub/{j}"
            return f"{base}/p/{j}"

        special: dict[int, str] = {}
        for j in range(1, n_pages):
            r = rng.random()
            if r < 0.06:
                special[j] = "dynamic"
            elif r < 0.10:
                special[j] = "http_error"      # status 404/500 → R2
            elif r < 0.14:
                special[j] = "transient"        # fail_attempts=1 → succeeds
            elif r < 0.17:
                special[j] = "permanent_fail"   # fail_attempts=2 → R2
            elif r < 0.20:
                special[j] = "raise_in_loop"    # R3
            elif r < 0.23:
                special[j] = "selenium_flaky"   # T3 requeue, then succeeds

        for j in range(n_pages):
            norm = page_norm(j)
            children = [
                c
                for c in range(branching * j + 1, branching * j + branching + 1)
                if c < n_pages
            ]
            hrefs: list[str] = []
            for c in children:
                cn = page_norm(c)
                path = cn[len(base):] or "/"
                form = rng.random()
                if form < 0.4:
                    hrefs.append(path)                      # relative
                elif form < 0.6:
                    hrefs.append(cn + "/")                  # trailing slash
                elif form < 0.75:
                    hrefs.append(path + "?ref=nav")         # query (normalized away)
                else:
                    hrefs.append(cn)                        # absolute
            # duplicate + cross links (in-pool duplicate semantics J2)
            if j > 3:
                back = int(rng.integers(0, j))
                hrefs.append(page_norm(back)[len(base):] or "/")
            if rng.random() < 0.3 and n_pages > 5:
                hrefs.append(page_norm(int(rng.integers(0, n_pages)))[len(base):] or "/")
            # out-of-scope link
            if rng.random() < 0.3:
                hrefs.append(f"https://host{(hi + 1) % n_hosts}.test/p/1")
            # media links: image-typed (skipped) + occasionally dangling
            if rng.random() < 0.25:
                hrefs.append(f"/gallery/pic{j}.jpg")
            if rng.random() < 0.08:
                hrefs.append(f"/gallery/missing{j}.png")    # dangling media → HEAD fails → R2
            # the text/html-with-.jpg fall-through page
            if j == 2 and n_pages > 3:
                hrefs.append("/print/page2.jpg")
            # suspicious-query link that normalizes into an existing page
            if rng.random() < 0.15 and n_pages > 6:
                hrefs.append(f"/p/6?itemId={j}")
            # image detail pages (no media extension → processed as F7)
            if rng.random() < 0.35:
                img_id = images.iloc[int(rng.integers(0, len(images)))]["image_id"]
                hrefs.append(f"/img/{img_id}")
            # pdfs + dangling html link
            if j == 1:
                hrefs.append("/doc/report1.pdf")
                hrefs.append("/doc/report2.pdf")
            if rng.random() < 0.06:
                hrefs.append(f"/missing/{j}")               # dangling → R2

            kind = special.get(j, "normal")
            is_dynamic = kind == "dynamic"
            filler_long = _filler(rng, 120)  # ≥ 500 chars of text
            filler_short = _filler(rng, 10)
            title = f"Page {j} of {host}"
            body = _page_html(
                title,
                hrefs if not is_dynamic else hrefs[: max(1, len(hrefs) // 3)],
                filler_short if is_dynamic else filler_long,
                f"desc {host} {j}",
                f"og {host} {j}",
                f"ld {host} {j}",
                include_title=(j != 3),  # one titleless page per host:
                # the reference still emits metadata['title'] = None
            )
            dynamic_body = None
            dynamic_links = None
            if is_dynamic:
                dynamic_body = _page_html(
                    title, hrefs, filler_long, f"desc {host} {j}",
                    f"og {host} {j}", f"ld {host} {j}",
                )
                # DOM-harvested links are absolute (selenium href property)
                from ..functions.urlnorm import resolve_link
                dynamic_links = sorted({resolve_link(norm, h) for h in hrefs})

            status = 200
            fail_attempts = 0
            if kind == "http_error":
                status = int(rng.choice([404, 500, 503]))
            elif kind == "transient":
                fail_attempts = 1
            elif kind == "permanent_fail":
                fail_attempts = 2

            web_rows.append(
                {
                    "url": _raw_variant(rng, norm),
                    "url_norm": norm,
                    "host": host,
                    "status": np.int32(status),
                    "content_type": "text/html",
                    "body": body.encode(),
                    "links": hrefs,
                    "is_dynamic": is_dynamic,
                    "dynamic_body": dynamic_body.encode() if dynamic_body else None,
                    "dynamic_links": dynamic_links,
                    "image_id": None,
                    "fail_attempts": np.int32(fail_attempts),
                    "selenium_fail_attempts": np.int32(
                        1 if kind == "selenium_flaky" else 0
                    ),
                    "raise_in_loop": kind == "raise_in_loop",
                }
            )

        # --- non-page URLs --------------------------------------------------
        def add_simple(norm, ctype, body, image_id=None, status=200):
            web_rows.append(
                {
                    "url": norm,
                    "url_norm": norm,
                    "host": host,
                    "status": np.int32(status),
                    "content_type": ctype,
                    "body": body,
                    "links": [],
                    "is_dynamic": False,
                    "dynamic_body": None,
                    "dynamic_links": None,
                    "image_id": image_id,
                    "fail_attempts": np.int32(0),
                    "selenium_fail_attempts": np.int32(0),
                    "raise_in_loop": False,
                }
            )

        # media-extension URLs serving image/* (P6 skip path)
        for j in range(n_pages):
            if rng.random() < 0.25:
                img = images.iloc[int(rng.integers(0, len(images)))]
                add_simple(
                    f"{base}/gallery/pic{j}.jpg",
                    "image/jpeg",
                    bytes(img["bytes"]),
                    image_id=img["image_id"],
                )
        # the .jpg URL that actually serves HTML (P6 fall-through)
        add_simple(
            f"{base}/print/page2.jpg",
            "text/html",
            _page_html(
                f"print page of {host}", ["/p/1"], _filler(rng, 120),
                "print desc", "print og", "print ld",
            ).encode(),
        )
        # image detail pages (unsupported content type F7)
        for _, img in images.iterrows():
            add_simple(
                f"{base}/img/{img['image_id']}",
                "image/png" if img["fmt"] == "png" else f"image/{img['fmt']}",
                bytes(img["bytes"]),
                image_id=img["image_id"],
            )
        # two pdfs per host: a marker-style body (stub-extractor path)
        # and a REAL linear PDF with a Flate-compressed content stream
        # (pdf_text's zlib path, reference F4 parity)
        pdf_text = f"annual report of {host} " + _filler(rng, 30)
        # both pdfs carry a trailer /Info doc-information dict so F3's
        # PDF half (reference metadata.update(reader.metadata)) has
        # real data to surface
        add_simple(
            f"{base}/doc/report1.pdf",
            "application/pdf",
            (
                f"%PDF-1.4\nBT {pdf_text} ET\n"
                f"9 0 obj\n<< /Title (Annual Report {host}) "
                f"/Author (wormpy fixtures) /Producer (webgen) >>\nendobj\n"
                f"trailer\n<< /Info 9 0 R >>\n%%EOF"
            ).encode(),
        )
        import zlib

        pdf2_text = f"compressed report of {host}: " + _filler(rng, 20)
        content = f"BT /F1 12 Tf 72 712 Td ({pdf2_text}) Tj ET".encode()
        comp = zlib.compress(content)
        add_simple(
            f"{base}/doc/report2.pdf",
            "application/pdf",
            b"%PDF-1.4\n1 0 obj\n<< /Length "
            + str(len(comp)).encode()
            + b" /Filter /FlateDecode >>\nstream\n"
            + comp
            + b"\nendstream\nendobj\n2 0 obj\n<< /Title (Compressed Report "
            + host.encode()
            + b") /Author (wormpy fixtures) >>\nendobj\ntrailer\n<< /Info 2 0 R >>\n%%EOF\n",
        )

        # --- sitemaps (S2/S3) ----------------------------------------------
        if hi == 0:
            # sitemapindex on the first probe location → two sub-sitemaps
            subs = [f"{base}/post-sitemap.xml", f"{base}/page-sitemap.xml"]
            index_xml = (
                '<?xml version="1.0"?><sitemapindex>'
                + "".join(f"<sitemap><loc>{s}</loc></sitemap>" for s in subs)
                + "</sitemapindex>"
            )
            sitemap_rows.append(
                {"host": host, "url": f"{base}/sitemap.xml", "kind": "probe",
                 "probe_rank": np.int32(0), "content_type": "application/xml",
                 "xml": index_xml}
            )
            urls_a = [page_norm(j) for j in range(1, min(8, n_pages))]
            urls_b = [page_norm(j) for j in range(8, min(14, n_pages))] + [
                f"https://other-host.test/p/1",          # dropped by is_valid_url
                f"{base}/gallery/pic1.jpg",               # media ext → dropped by is_valid_url
            ]
            for sub, urls in zip(subs, (urls_a, urls_b)):
                xml = (
                    '<?xml version="1.0"?><urlset>'
                    + "".join(f"<url><loc>{u}</loc></url>" for u in urls)
                    + "</urlset>"
                )
                sitemap_rows.append(
                    {"host": host, "url": sub, "kind": "sub",
                     "probe_rank": np.int32(-1), "content_type": "text/xml",
                     "xml": xml}
                )
        elif hi == 1:
            # first xml hit is unparseable → ET.ParseError → empty seed set
            sitemap_rows.append(
                {"host": host, "url": f"{base}/sitemap_index.xml", "kind": "probe",
                 "probe_rank": np.int32(1), "content_type": "text/xml",
                 "xml": "<urlset><loc>broken"}
            )
        else:
            # plain urlset on a later probe location, incl. out-of-prefix
            # same-netloc URLs (admitted by P3, dropped later by P4 in
            # subtree runs)
            urls = [page_norm(j) for j in range(1, min(10, n_pages))]
            xml = (
                '<?xml version="1.0"?><urlset>'
                + "".join(f"<url><loc>{u}</loc></url>" for u in urls)
                + "</urlset>"
            )
            sitemap_rows.append(
                {"host": host, "url": f"{base}/wp-sitemap.xml", "kind": "probe",
                 "probe_rank": np.int32(8), "content_type": "text/xml",
                 "xml": xml}
            )

        # --- robots ----------------------------------------------------------
        if hi == 0:
            robots_rows.append(
                {"host": host, "status": np.int32(200),
                 "body": "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"}
            )
        elif hi == 1:
            robots_rows.append(
                {"host": host, "status": np.int32(200),
                 "body": "User-agent: *\nDisallow: /p/\nAllow: /p/1\n"}
            )
        else:
            robots_rows.append({"host": host, "status": np.int32(404), "body": None})

    web = pd.DataFrame(web_rows)
    # the web table is keyed by url_norm — first writer wins (duplicates
    # can only arise from _raw_variant collisions, which cannot happen
    # because url_norm values are unique per construction)
    assert web["url_norm"].is_unique, "fixture invariant: unique url_norm"

    seeds = pd.DataFrame(
        [
            {"run_id": "discovery_h0", "url": "https://HOST0.test/",
             "budget": np.int32(100), "discovery": True, "politeness_seed": np.int64(42)},
            {"run_id": "single_h1", "url": "https://host1.test/p/1?x=1",
             "budget": np.int32(1), "discovery": False, "politeness_seed": np.int64(42)},
            {"run_id": "subtree_h2", "url": "https://host2.test/sub/4",
             "budget": np.int32(100), "discovery": True, "politeness_seed": np.int64(43)},
            {"run_id": "budget20_h0", "url": "https://host0.test",
             "budget": np.int32(20), "discovery": True, "politeness_seed": np.int64(44)},
        ]
    )

    return {
        "web": web,
        "images": pd.concat(all_images, ignore_index=True),
        "images_truth": pd.concat(all_truth, ignore_index=True),
        "sitemaps": pd.DataFrame(sitemap_rows),
        "robots": pd.DataFrame(robots_rows),
        "seeds": seeds,
    }
