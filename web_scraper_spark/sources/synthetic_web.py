"""Deterministic hermetic synthetic web (FIXTURES.md §3, seed=42).

No network exists in this sandbox, so the fetch stage's test
implementation joins the frontier against this table (SURVEY.md A6).
The generator is pure Python + numpy so the reference-oracle simulator
can walk the very same web without Spark.

Shape knobs mirror the reference workload (997 seed domains,
README.md:239 67.2% fetch coverage -> ~1/3 failures) plus graft
requirements: one hot host holding ~10% of all URLs (skew), seed
duplicates and a trailing-slash alias pair (exercises the reference's
duplicate-fetch behavior, SURVEY.md F5), image/png + image/jpeg payload
URLs with alt-text captions.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass

import numpy as np

from web_scraper_spark.operators.imagecodec import (
    average_hash,
    decode_image,
    encode_fjpg,
    encode_png,
)

SEED = 42
HOT_HOST_CONTACTS = 40  # hot domain fans out to this many contact pages

SOCIAL_SNIPPETS = [
    '<a href="https://www.facebook.com/{name}">Facebook</a>',
    '<a href="https://twitter.com/{tw}">Twitter</a>',
    '<a href="https://www.linkedin.com/company/{name}/">LinkedIn</a>',
    '<a href="https://instagram.com/{ig}/">Instagram</a>',
    '<a href="https://youtube.com/c/{name}TV/">YouTube</a>',
]


@dataclass
class WebRow:
    url: str  # canonical page URL (scheme://host/path, no trailing /)
    host: str
    depth: int
    status: int  # 200, 404, or 0 (timeout sentinel)
    content_type: str
    body: bytes


def image_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic pixels derived from the image id — both the
    generator and the verification UDF recompute these independently."""
    digest = hashlib.sha1(image_id.encode()).digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
    base = rng.randint(0, 256, size=(h, w, 3))
    gx = np.linspace(0, 80, w)[None, :, None]
    gy = np.linspace(0, 60, h)[:, None, None]
    return ((base * 0.5 + gx + gy) % 256).astype(np.uint8)


def _domain(i: int) -> str:
    return f"acme-{i:04d}.test"


def image_id_of(url: str) -> str:
    """image_id = sha1 hex of the canonical image URL (FIXTURES.md §4)."""
    return hashlib.sha1(url.encode()).hexdigest()


def _page_html(rng: random.Random, i: int, host: str, contact_paths: list[str],
               n_images: int) -> str:
    name = f"acme{i:04d}"
    phone_suffix = 2000 + (i % 7000)
    parts = [
        "<html><head>",
        f"<title>Acme {i:04d} Corp</title>",
        "<style>body { color: red; } /* 555-999-0000 decoy */</style>",
        "<script>var x = 'tel:+19998887777'; // decoy</script>",
        "</head><body>",
        f"<h1>Welcome to Acme {i:04d}, Inc.</h1>",
    ]
    if rng.random() < 0.75:
        parts.append(f'<a href="tel:+1 (212) 555-{phone_suffix:04d}">Call</a>')
    if rng.random() < 0.5:
        parts.append(f"<p>Phone: 212-555-{phone_suffix:04d}</p>")
    for snippet in SOCIAL_SNIPPETS:
        if rng.random() < 0.55:
            parts.append(snippet.format(name=name, tw=name[:15], ig=name))
    if rng.random() < 0.6:
        parts.append(
            f"<address>{100 + i % 899} Main Street, Springfield, IL 6270{i % 10}</address>"
        )
    if rng.random() < 0.35:
        parts.append(
            f'<div itemprop="address">Suite {i % 90 + 1}, {200 + i % 700} Oak Avenue, Portland</div>'
        )
    if rng.random() < 0.4:
        parts.append(f"<p>Our office: {10 + i % 80} Elm Road, floor {1 + i % 9}</p>")
    for path in contact_paths:
        if rng.random() < 0.5:
            parts.append(f'<a href="{path}">Contact us</a>')
        else:
            # href without keyword; link text triggers the pattern match
            parts.append(f'<a href="{path}">Get in touch</a>')
    # an external contact link that MUST be dropped by the same-netloc gate
    parts.append('<a href="http://other-domain.test/contact">their contact</a>')
    parts.append('<a href="#top">top</a><a href="mailto:x@y.test">mail</a>')
    for k in range(n_images):
        fmt = "png" if (i + k) % 2 == 0 else "jpg"
        parts.append(
            f'<img src="/img/{k}.{fmt}" alt="product shot {k} of acme {i:04d}">'
        )
    parts.append("</body></html>")
    return "\n".join(parts)


def _contact_html(rng: random.Random, i: int, path: str) -> str:
    extra_phone = 5000 + (i % 4000)
    parts = [
        "<html><body>",
        f"<h2>Contact Acme {i:04d}</h2>",
        f'<a href="tel:+1 (646) 555-{extra_phone:04d}">Call HQ</a>',
        f"<address>{300 + i % 600} Contact Plaza, New York, NY 1000{i % 10}</address>",
        # contact pages also carry contact-looking links; these are NOT
        # re-queued because C4 is depth-gated (html_data_extractor.py:153-155)
        '<a href="/contact">Contact</a>',
        "</body></html>",
    ]
    return "\n".join(parts)


def build_web(n_domains: int = 40, seed: int = SEED):
    """Returns (seeds, web_rows).

    ``seeds``: list[str] raw seed-CSV domain column, including dupes, an
    empty row, and a trailing-slash alias of domain 0 (F5 fixture).
    ``web_rows``: list[WebRow] — every fetchable URL.
    """
    rng = random.Random(seed)
    seeds: list[str] = []
    web: list[WebRow] = []

    for i in range(n_domains):
        host = _domain(i)
        seeds.append(host)
        if i == 1:
            seeds.append(host)  # exact duplicate -> seed dedup (F1)
        if i == 2:
            seeds.append("")  # empty row -> skipped (A1)
        if i == 0:
            # alias with trailing slash: prepare_url keeps it distinct, so
            # the reference fetches the same page twice (F5 semantics)
            seeds.append(host + "/")

        # ~1/4 of hosts publish robots.txt: every 4th disallows /contact
        # (blocking its contact-page fan-out) and sets a crawl delay;
        # every 8th ALSO allows /contact-1 back (the RFC 9309
        # longest-match override — /contact-1 survives, /contact-2 dies)
        if i % 4 == 3:
            robots_body = (
                "# synthetic robots\n"
                "User-agent: *\n"
                "Disallow: /contact\n"
                + ("Allow: /contact-1\n" if i % 8 == 3 else "")
                + "Crawl-delay: 0.5\n"
            )
            web.append(
                WebRow(
                    url=f"http://{host}/robots.txt",
                    host=host,
                    depth=0,
                    status=200,
                    content_type="text/plain",
                    body=robots_body.encode(),
                )
            )

        # hot host: domain 0 gets a large contact fan-out (skew fixture)
        n_contacts = HOT_HOST_CONTACTS if i == 0 else rng.randint(0, 3)
        contact_paths = [f"/contact-{c}" if c else "/contact" for c in range(n_contacts)]
        n_images = rng.randint(0, 3)

        # domain 0 is the hot-host skew fixture — it must fetch OK so its
        # 40-contact fan-out actually lands in the frontier
        seed_status = (
            200 if (i == 0 or rng.random() > 0.33) else (404 if rng.random() < 0.5 else 0)
        )
        page = _page_html(rng, i, host, contact_paths, n_images)
        web.append(
            WebRow(
                url=f"http://{host}",
                host=host,
                depth=0,
                status=seed_status,
                content_type="text/html",
                body=page.encode("utf-8"),
            )
        )
        for path in contact_paths:
            curl = f"http://{host}{path}"
            cstatus = 200 if rng.random() > 0.25 else 404
            web.append(
                WebRow(
                    url=curl,
                    host=host,
                    depth=1,
                    status=cstatus,
                    content_type="text/html",
                    body=_contact_html(rng, i, path).encode("utf-8"),
                )
            )
        for k in range(n_images):
            fmt = "png" if (i + k) % 2 == 0 else "jpg"
            iurl = f"http://{host}/img/{k}.{fmt}"
            w = 16 + (i + k) % 32
            h = 12 + (i * 3 + k) % 24
            # image_id = sha1(canonical url) (FIXTURES.md §4); pixels are
            # keyed off the id so verifiers can recompute them without
            # knowing the url
            pixels = image_pixels(image_id_of(iurl), w, h)
            body = encode_png(pixels) if fmt == "png" else encode_fjpg(pixels)
            web.append(
                WebRow(
                    url=iurl,
                    host=host,
                    depth=1,
                    status=200,
                    content_type="image/png" if fmt == "png" else "image/jpeg",
                    body=body,
                )
            )
    return seeds, web


def company_names_rows(n_domains: int = 40, seed: int = SEED):
    """Side-input CSV rows (FIXTURES.md §2): (domain, commercial, legal, all)."""
    rng = random.Random(seed + 1)
    rows = []
    for i in range(n_domains):
        host = _domain(i)
        legal = f"Acme {i:04d}, Inc." if rng.random() < 0.6 else ""
        commercial = f"Acme {i:04d}" if rng.random() < 0.7 else ""
        alln = f"Acme {i:04d}|ACME-{i:04d} Corporation"
        rows.append((host, commercial, legal, alln))
    # rows that must be skipped: generic domain, empty names
    rows.append(("google.com", "Google", "", ""))
    rows.append((_domain(0), "", "", ""))
    return rows


def web_host_df(spark, n_domains: int = 40, seed: int = SEED):
    """Synthetic web as a Spark DataFrame (the fetch-join's right side)."""
    from pyspark.sql.types import (
        BinaryType, IntegerType, StringType, StructField, StructType,
    )

    _, web = build_web(n_domains, seed)
    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("host", StringType()),
            StructField("depth", IntegerType()),
            StructField("status", IntegerType()),
            StructField("content_type", StringType()),
            StructField("body", BinaryType()),
        ]
    )
    rows = [(r.url, r.host, r.depth, r.status, r.content_type, r.body) for r in web]
    # size-adaptive slicing: ~512 pages per partition instead of always
    # defaultParallelism slices — a 1.2k-page fixture otherwise becomes 32
    # near-empty partitions and every scan of the cached web pays 32 task
    # launches (optimization guide §2; values and row order unchanged)
    n_slices = max(1, min(spark.sparkContext.defaultParallelism, len(rows) // 512))
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, n_slices), schema)


def verify_image_row(image_id: str, body: bytes, caption: str, expected_caption: str):
    """Per-row image invariant (BASELINE.json input_hint): decode, compare
    against independently recomputed pixels — bit-exact for PNG, PSNR>=40 dB
    for lossy — plus caption equality. Returns (ok, psnr_db, fmt)."""
    from web_scraper_spark.operators.imagecodec import psnr as _psnr

    pixels, fmt = decode_image(body)
    h, w = pixels.shape[:2]
    expected = image_pixels(image_id, w, h)
    db = _psnr(expected, pixels)
    ok = (
        (fmt == "png" and np.array_equal(expected, pixels))
        or (fmt != "png" and db >= 40.0)
    ) and caption == expected_caption
    return ok, db, fmt


__all__ = [
    "build_web",
    "company_names_rows",
    "web_host_df",
    "image_pixels",
    "verify_image_row",
    "WebRow",
    "average_hash",
]
