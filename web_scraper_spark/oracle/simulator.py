"""Pure-Python simulator of the reference crawl pipeline.

Mirrors, message by message, what ``alindragut/web_scraper`` computes over
the hermetic synthetic web (sources/synthetic_web.py), producing golden:

- crawl order: canonically ordered fetch attempts (SURVEY.md §3.4 —
  ``(round, depth, seed_idx, url)``; within-round Kafka interleaving is
  nondeterministic in the reference, the canonical order is the agreed
  parity contract),
- final URL-seen set (prepared seed URLs ∪ queued contact URLs,
  reference run_url_producer.py:24,41-43 + extractor_service.py:69-76 —
  note contact URLs are NOT deduped across pages, SURVEY.md F5),
- final merged company documents (storage_service.py:55-112 semantics),
- the graft image+caption landing table (image_id, w, h, fmt, caption,
  phash) — the reference drops images (web_fetcher.py:36-39); the graft
  routes them.

Extraction semantics are delegated to the pure-Python functions in
``operators.extract`` — those are themselves pinned by hand-built unit
fixtures in tests/test_extract.py, so the pipeline logic here (rounds,
dedup, merge, politeness) stays an independent check of the Spark
plumbing.

Politeness: the reference has none (SURVEY.md scope note); with
``politeness_budget=None`` rounds == BFS depths (reference behavior).
With a budget B, at most B fetches per host per round, hosts draining in
``(seed_idx, url)`` order — the same rule the engine implements with a
window function, so graft runs stay order-comparable.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from web_scraper_spark.operators.extract import extract_record
from web_scraper_spark.operators.imagecodec import average_hash, decode_image
from web_scraper_spark.sources.synthetic_web import WebRow, image_id_of

_SCHEME_RE = re.compile(r"^[a-zA-Z]+://")
GENERIC_DOMAINS = {"google.com", "facebook.com", "twitter.com", "linkedin.com", "youtube.com"}

# storage-side social patterns (normalization_utils.py:10-16) — these
# differ from the extractor's (non-capturing path prefixes here)
_NORM_SOCIAL = [
    ("facebook", re.compile(r"facebook\.com/((?!.*\b(?:sharer|plugins|events|groups|notes|photo)\b)[a-zA-Z0-9._/-]+)")),
    ("twitter", re.compile(r"(?:twitter|x)\.com/([a-zA-Z0-9_]{1,15})(?!\b(?:intent|share|search)\b)")),
    ("linkedin", re.compile(r"linkedin\.com/(?:company/|in/)([a-zA-Z0-9._-]+/?)")),
    ("instagram", re.compile(r"instagram\.com/([a-zA-Z0-9._]+/?)(?!.*\b(?:p/|explore)\b)")),
    ("youtube", re.compile(r"youtube\.com/(?:user/|channel/|c/)?([a-zA-Z0-9._-]+/?)")),
]

_SUFFIXES = ["inc", "llc", "ltd", "p.c", "pty", "corporation", "company"]


def prepare_url(url_input: str) -> str:
    url_input = url_input.strip()
    if not url_input:
        return ""
    if not _SCHEME_RE.match(url_input):
        return "http://" + url_input
    return url_input


def get_domain_from_url(url: str | None) -> str | None:
    if not url:
        return None
    from urllib.parse import urlparse

    if "://" not in url:
        url = "http://" + url
    netloc = urlparse(url).netloc
    if netloc.startswith("www."):
        netloc = netloc[4:]
    if netloc and netloc not in GENERIC_DOMAINS:
        return netloc.lower()
    return None


def normalize_social_media_profile(url: str) -> str | None:
    if not url:
        return None
    for platform, pattern in _NORM_SOCIAL:
        m = pattern.search(url)
        if m:
            profile_id = m.group(1).strip("/").lower()
            if profile_id:
                return f"{platform}:{profile_id}"
    return None


def normalize_phone_number(phone: str | None) -> str | None:
    """NANP-subset mirror of normalization_utils.py:36-53 (documented in
    functions/phones.py — fixtures are NANP so parity is exact)."""
    if not phone:
        return None
    from urllib.parse import unquote

    s = unquote(phone.strip())
    digits = re.sub(r"\D", "", s)
    is_intl = s.startswith("+")
    cc = re.match(r"^\+(\d{1,3})", s)
    foreign = is_intl and cc and not cc.group(1).startswith("1")
    nanp = re.sub(r"^1(?=\d{10}$)", "", digits)
    if not foreign and re.match(r"^[2-9]\d{2}[2-9]\d{6}$", nanp):
        return "+1" + nanp
    if foreign and re.match(r"^\d{8,15}$", digits):
        return "+" + digits
    return None


def normalize_company_name(name: str | None) -> str:
    if not name:
        return ""
    name = name.lower()
    for suffix in _SUFFIXES:
        name = re.sub(r"\b" + re.escape(suffix) + r"\b\.?", "", name)
    name = re.sub(r"[^\w\s]", "", name)
    return " ".join(name.split())


def best_name(commercial: str, legal: str, alln: str) -> str | None:
    for cand in (legal, commercial, (alln.split("|")[0] if alln else "")):
        if cand and cand.strip():
            return cand.strip()
    return None


def canonicalize(url: str) -> str:
    """Canonical absolute form — mirror of functions.urls.canonicalize_url."""
    from urllib.parse import urlparse

    p = urlparse(url)
    scheme = (p.scheme or "http").lower()
    if scheme not in ("http", "https"):
        scheme = "http"
    return f"{scheme}://{p.netloc}{p.path}".rstrip("/")


_ORC_RESERVED = set("/?#[]@!$&'()*+,;=:%")


def _orc_segment_options(segment: str) -> list[tuple[str, ...]]:
    """Wildcard-free rule segment -> per-position tuples of acceptable
    text spellings (RFC 9309 §2.2.2 percent-encoding comparison).
    Independent reimplementation of the engine's tokenizer semantics:
    raw ASCII chars accept only themselves; raw non-ASCII and escaped
    non-reserved chars accept the literal char or its %-encoded UTF-8
    form (hex case-insensitive, handled by uppercasing the compared text
    slice); escaped reserved/undecodable octets accept only the escape."""
    import re

    opts: list[tuple[str, ...]] = []
    pos = 0
    esc = re.compile(r"(?:%[0-9a-fA-F]{2})+")
    while pos < len(segment):
        m = esc.match(segment, pos)
        if m:
            raw = m.group(0)
            octets = bytes(
                int(raw[k + 1 : k + 3], 16) for k in range(0, len(raw), 3)
            )
            try:
                chars = octets.decode("utf-8")
            except UnicodeDecodeError:
                chars = None
            if chars is None:
                for b in octets:
                    c = chr(b)
                    if b < 128 and c not in _ORC_RESERVED:
                        opts.append((c, "%%%02X" % b))
                    else:
                        opts.append(("%%%02X" % b,))
            else:
                for c in chars:
                    enc = "".join("%%%02X" % b for b in c.encode("utf-8"))
                    if c in _ORC_RESERVED:
                        opts.append((enc,))
                    else:
                        opts.append((c, enc))
            pos = m.end()
        else:
            c = segment[pos]
            if ord(c) > 127:
                enc = "".join("%%%02X" % b for b in c.encode("utf-8"))
                opts.append((c, enc))
            else:
                opts.append((c,))
            pos += 1
    return opts


def _orc_ends(text: str, start: int, opts: list[tuple[str, ...]]) -> set[int]:
    """All end positions of a full segment match beginning exactly at
    ``start`` — a reachable-positions sweep, complete by construction
    (no greedy choices). Escape options compare hex case-insensitively."""
    ends = {start}
    for alternatives in opts:
        nxt: set[int] = set()
        for e in ends:
            for opt in alternatives:
                cand = text[e : e + len(opt)]
                if cand == opt or (
                    opt.startswith("%") and cand.upper() == opt
                ):
                    nxt.add(e + len(opt))
        if not nxt:
            return set()
        ends = nxt
    return ends


def wildcard_rule_matches(pattern: str, text: str) -> bool:
    """RFC 9309 rule match (``*`` any chars, trailing ``$`` anchors,
    §2.2.2 percent-encoding comparison) — deliberately INDEPENDENT of the
    engine's rule_to_regex translation (sources/robots.py), so a
    translation bug cannot hide behind shared code. Implemented as a
    reachable-positions sweep: each wildcard-free segment expands into
    per-char spelling alternatives, matched via a position-set DP; '*'
    lifts the reachable set to every later position."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    segments = [_orc_segment_options(p) for p in body.split("*")]
    ends = _orc_ends(text, 0, segments[0])
    for opts in segments[1:]:
        if not ends:
            return False
        lo = min(ends)
        nxt: set[int] = set()
        for s in range(lo, len(text) + 1):
            nxt |= _orc_ends(text, s, opts)
        ends = nxt
    if not ends:
        return False
    return (len(text) in ends) if anchored else True


def frontier_sort_key(priority: float, seed_idx: int, url: str):
    """Politeness drain order per host: (priority, seed_idx, RAW frontier
    url) — byte-identical to the engine's ORDER_COLS
    (operators/politeness.py). The url tiebreak is the raw frontier url,
    NOT its canonical form: a non-canonical frontier entry (e.g. a
    trailing-slash seed alias) must sort the same way on both sides."""
    return (priority, seed_idx, url)


@dataclass
class OracleResult:
    crawl_order: list[tuple[int, int, int, str]]  # (round, depth, seed_idx, url)
    url_seen: set[str]
    documents: dict[str, dict]
    images: list[dict] = field(default_factory=list)
    fetched_ok: int = 0
    produced: int = 0


def simulate(
    seeds: list[str],
    web: list[WebRow],
    names_rows: list[tuple[str, str, str, str]] | None = None,
    politeness_budget: int | None = None,
    route_images: bool = True,
    use_robots: bool = False,
    robots_agent: str = "*",
    priority_fn=None,
) -> OracleResult:
    web_by_canon = {canonicalize(r.url): r for r in web}

    # robots rules per host (graft; mirror of sources/robots.py semantics:
    # Disallow/Allow longest-match wins, ties to Allow — RFC 9309 §2.2.2).
    # Robots fetches are bookkeeping — not part of the crawl order.
    robots_rules: dict[str, tuple[list[str], list[str]]] = {}
    if use_robots:
        from web_scraper_spark.sources.robots import parse_robots_body

        for row in web:
            if row.url.endswith("/robots.txt") and row.status == 200:
                disallow, allow, _delay = parse_robots_body(
                    row.body.decode(), robots_agent
                )
                robots_rules[row.host] = (disallow, allow)

    def robots_allows(url: str) -> bool:
        if not use_robots:
            return True
        from urllib.parse import urlparse

        p = urlparse(url)
        path = (p.path + (f"?{p.query}" if p.query else "")) or "/"
        disallow, allow = robots_rules.get(p.netloc.lower(), ([], []))
        octets = lambda r: len(r.encode("utf-8"))
        dis = max((octets(r) for r in disallow if wildcard_rule_matches(r, path)), default=-1)
        alw = max((octets(r) for r in allow if wildcard_rule_matches(r, path)), default=-1)
        return not dis > alw

    # --- seed stage (run_url_producer.py:24-54): prepare, global dedup ---
    seen_prepared: set[str] = set()
    frontier: list[tuple[int, str, str]] = []  # (seed_idx, fetch_url, seed_url)
    idx = 0
    for raw in seeds:
        if not raw or not raw.strip():
            continue
        prepared = prepare_url(raw)
        if prepared in seen_prepared:
            continue
        seen_prepared.add(prepared)
        frontier.append((idx, prepared, prepared))
        idx += 1

    url_seen: set[str] = set(seen_prepared)
    crawl_order: list[tuple[int, int, int, str]] = []
    documents: dict[str, dict] = {}
    images: list[dict] = []
    image_ids: set[str] = set()
    image_captions: dict[str, str] = {}
    fetched_ok = 0
    produced = len(frontier)

    def merge_extracted(domain: str, rec: dict) -> None:
        doc = documents.setdefault(
            domain,
            {
                "url": None, "company_name": None, "searchable_name": None,
                "phone_numbers": [], "social_media_links": [], "addresses": [],
                "domain": domain, "social_media_profiles": [],
                "normalized_phone_numbers": [],
            },
        )
        for key in ("phone_numbers", "social_media_links", "addresses",
                    "social_media_profiles", "normalized_phone_numbers"):
            for item in rec.get(key, []):
                if item is not None and item not in doc[key]:
                    doc[key].append(item)
        if rec.get("url") is not None:
            doc["url"] = rec["url"]

    def entry_priority(entry: tuple[int, str, str], depth: int) -> float:
        """Priority-queue dimension; default FIFO-by-seed (== engine's
        _with_priority default)."""
        if priority_fn is None:
            return float(entry[0])
        from urllib.parse import urlparse

        host = urlparse(canonicalize(entry[1])).netloc.lower()
        return float(priority_fn(entry[1], host, depth, entry[0]))

    def rounds_for(batch: list[tuple[int, str, str]], base_round: int, depth: int):
        """Politeness scheduling: per-host budget, (priority, seed_idx,
        url) order."""
        if politeness_budget is None:
            return [(base_round, batch)]
        from urllib.parse import urlparse

        per_host_rank: dict[str, int] = {}
        out: dict[int, list] = {}
        for entry in sorted(
            batch,
            key=lambda e: frontier_sort_key(entry_priority(e, depth), e[0], e[1]),
        ):
            host = urlparse(entry[1]).netloc.lower()
            rank = per_host_rank.get(host, 0)
            per_host_rank[host] = rank + 1
            rnd = base_round + rank // politeness_budget
            out.setdefault(rnd, []).append(entry)
        return sorted(out.items())

    # --- BFS rounds (depth 0 then 1; extractor_service.py:69-76) ---------
    depth = 0
    next_round = 0
    batch = frontier
    while batch:
        # robots filtering happens before scheduling: blocked URLs never
        # consume politeness slots nor appear in the crawl order (they do
        # stay in url_seen — they were discovered). Match on the RAW
        # frontier url exactly like the engine's filter_allowed — a
        # canonicalized url drops the trailing slash and would diverge on
        # rules like 'Disallow: /app/' (review r2)
        batch = [e for e in batch if robots_allows(e[1])]
        if not batch:
            break
        next_frontier: list[tuple[int, str, str]] = []
        for rnd, sub in rounds_for(batch, next_round, depth):
            next_round = rnd + 1
            for seed_idx, fetch_url, seed_url in sorted(sub, key=lambda e: (e[0], canonicalize(e[1]))):
                crawl_order.append((rnd, depth, seed_idx, canonicalize(fetch_url)))
                row = web_by_canon.get(canonicalize(fetch_url))
                if row is None or row.status != 200:
                    continue  # fetch error -> dropped, no retry (web_fetcher.py:41-49)
                if "text/html" not in row.content_type:
                    if route_images and row.content_type.startswith("image/"):
                        iid = image_id_of(canonicalize(fetch_url))
                        if iid not in image_ids:
                            image_ids.add(iid)
                            pixels, fmt = decode_image(row.body)
                            images.append(
                                {
                                    "image_id": iid,
                                    "w": pixels.shape[1], "h": pixels.shape[0],
                                    "fmt": fmt,
                                    "caption": image_captions.get(canonicalize(fetch_url), ""),
                                    "phash": average_hash(pixels),
                                }
                            )
                    continue  # reference drops non-HTML (web_fetcher.py:36-39)
                fetched_ok += 1
                html = row.body.decode("utf-8", "replace")
                contact_url = fetch_url if depth == 1 else ""
                phones, socials, addrs, contacts, imgs = extract_record(
                    seed_url, html, contact_url
                )
                domain = get_domain_from_url(seed_url)
                if domain:
                    merge_extracted(
                        domain,
                        {
                            "url": seed_url,
                            "phone_numbers": phones,
                            "social_media_links": socials,
                            "addresses": addrs,
                            "social_media_profiles": [
                                p for p in (normalize_social_media_profile(s) for s in socials) if p
                            ],
                            "normalized_phone_numbers": [
                                p for p in (normalize_phone_number(x) for x in phones) if p
                            ],
                        },
                    )
                for cu in sorted(contacts):
                    url_seen.add(cu)
                    next_frontier.append((seed_idx, cu, seed_url))
                if depth == 0 and route_images:
                    for img in imgs:
                        url_seen.add(img["src"])
                        image_captions[img["src"]] = img["caption"]
                        next_frontier.append((seed_idx, img["src"], seed_url))
        batch = next_frontier
        depth += 1

    # --- names side-input (company_name_data_producer.py + storage) ------
    for domain_raw, commercial, legal, alln in names_rows or []:
        domain = get_domain_from_url(domain_raw)
        if not domain:
            continue
        name = best_name(commercial, legal, alln)
        if not name:
            continue
        doc = documents.setdefault(
            domain,
            {
                "url": None, "company_name": None, "searchable_name": None,
                "phone_numbers": [], "social_media_links": [], "addresses": [],
                "domain": domain, "social_media_profiles": [],
                "normalized_phone_numbers": [],
            },
        )
        doc["company_name"] = name
        doc["searchable_name"] = normalize_company_name(name)
        doc["url"] = prepare_url(domain_raw)

    return OracleResult(
        crawl_order=sorted(crawl_order),
        url_seen=url_seen,
        documents=documents,
        images=sorted(images, key=lambda d: d["image_id"]),
        fetched_ok=fetched_ok,
        produced=produced,
    )
