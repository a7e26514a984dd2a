"""Deterministic synthetic `pages` table generator (FIXTURES.md §1).

Produces the Common-Crawl-style input table
``(url string, warc_ts timestamp, html binary, text string, lang string)``
as in-memory rows or parquet, with:

* skewed hosts — two heavy-hitter hosts carry ~20% of rows (salting tests);
* HTML = nav/header/footer/link-farm boilerplate + main-content paragraphs;
* OCR-style character noise injected into some main-content words using the
  clean→noisy direction of the confusion table (ocr_errors.txt pattern,
  wordlists.NOISE_SUBS);
* everything seeded per-url: row i is a pure function of (seed, i), so any
  subset/partition regenerates identically (speculative-execution safe).

No Spark dependency here; writers use pyarrow directly.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from .wordlists import (
    BOILERPLATE_WORDS,
    ENGLISH_WORDS,
    GERMAN_WORDS,
    NOISE_SUBS,
)

HEAVY_HOSTS = ("big-news.example.com", "mega-portal.example.org")
LONG_TAIL_HOSTS = tuple(f"site-{i:03d}.example.net" for i in range(40))
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


@dataclass(frozen=True)
class Page:
    url: str
    warc_ts: datetime
    html: bytes
    text: str | None
    lang: str


def _rng_for(seed: int, i: int) -> random.Random:
    digest = hashlib.sha256(f"{seed}:{i}".encode()).digest()
    return random.Random(int.from_bytes(digest[:8], "big"))


def _sentence(rng: random.Random, words: tuple[str, ...], n: int) -> str:
    toks = [rng.choice(words) for _ in range(n)]
    toks[0] = toks[0].capitalize()
    return " ".join(toks) + "."


def _noise_word(rng: random.Random, word: str) -> str:
    """Apply one random applicable clean→noisy substitution."""
    applicable = [(c, n) for c, n in NOISE_SUBS if c in word]
    if not applicable:
        return word
    clean, noisy = applicable[rng.randrange(len(applicable))]
    i = word.find(clean)
    return word[:i] + noisy + word[i + len(clean):]


def _noisify(rng: random.Random, text: str, rate: float) -> str:
    out = []
    for w in text.split(" "):
        core = w.rstrip(".,")
        tail = w[len(core):]
        if core and rng.random() < rate:
            out.append(_noise_word(rng, core) + tail)
        else:
            out.append(w)
    return " ".join(out)


def _link_list(rng: random.Random, n: int) -> str:
    items = "".join(
        f'<li><a href="/{w}">{w}</a></li>'
        for w in (rng.choice(BOILERPLATE_WORDS) for _ in range(n))
    )
    return f"<ul>{items}</ul>"


def make_page(seed: int, i: int, noise_rate: float = 0.12) -> Page:
    """Deterministic page i. Main content = 2..6 paragraphs of dictionary
    words with injected confusion noise; boilerplate = nav/header/footer
    link farms and short promo divs."""
    rng = _rng_for(seed, i)
    # host skew: ~20% of rows on the two heavy hosts
    r = rng.random()
    if r < 0.10:
        host = HEAVY_HOSTS[0]
    elif r < 0.20:
        host = HEAVY_HOSTS[1]
    else:
        host = LONG_TAIL_HOSTS[rng.randrange(len(LONG_TAIL_HOSTS))]
    url = f"https://{host}/p/{i:09d}"
    warc_ts = _EPOCH + timedelta(seconds=rng.randrange(0, 14 * 86400))
    lang = "de" if rng.random() < 0.6 else ("en" if rng.random() < 0.9 else "fr")
    words = GERMAN_WORDS if lang == "de" else ENGLISH_WORDS

    paragraphs = [
        _sentence(rng, words, rng.randrange(8, 22)) + " " + _sentence(rng, words, rng.randrange(8, 22))
        for _ in range(rng.randrange(2, 7))
    ]
    clean_text = "\n".join(paragraphs)
    noisy_paragraphs = [_noisify(rng, p, noise_rate) for p in paragraphs]

    body_parts = [
        "<nav>", _link_list(rng, rng.randrange(4, 10)), "</nav>",
        f"<header><h1>{_sentence(rng, words, 4)[:-1]}</h1>", _link_list(rng, 3), "</header>",
        "<main>",
    ]
    for p in noisy_paragraphs:
        body_parts.append(f"<p>{p}</p>")
        if rng.random() < 0.25:  # interleaved short promo (boilerplate)
            promo = " ".join(rng.choice(BOILERPLATE_WORDS) for _ in range(3))
            body_parts.append(f'<div class="promo"><a href="/x">{promo}</a></div>')
    body_parts.append("</main>")
    body_parts.append("<aside>")
    body_parts.append(_link_list(rng, rng.randrange(5, 12)))
    body_parts.append("</aside>")
    body_parts.append(f"<footer>{_link_list(rng, 6)}<p>copyright {rng.randrange(1990, 2025)}</p></footer>")

    html = (
        "<!DOCTYPE html><html><head><title>t</title>"
        "<script>var x=1;</script><style>.a{color:red}</style></head>"
        "<body>" + "".join(body_parts) + "</body></html>"
    ).encode("utf-8")
    return Page(url=url, warc_ts=warc_ts, html=html, text=clean_text, lang=lang)


def make_rich_page(seed: int, i: int, noise_rate: float = 0.12) -> Page:
    """A heavier, more adversarial layout: table-of-contents nav, section
    titles, long paragraphs, a text-heavy but fully-link-wrapped
    related-articles rail, and an <aside>-wrapped comments section. The
    expected extraction is exactly: section titles + paragraphs, in order
    (titles are ≥25 chars so they are content by the base rule, not via
    island rescue)."""
    # two independent streams: `rng` drives structure/content, `nrng` the
    # noise injection — so the same (seed, i) yields identical structure at
    # ANY noise rate (clean/noisy pairs stay comparable)
    rng = _rng_for(seed ^ 0x5EC7, i)
    nrng = _rng_for(seed ^ 0xA015E, i)
    host = LONG_TAIL_HOSTS[rng.randrange(len(LONG_TAIL_HOSTS))]
    url = f"https://{host}/a/{i:09d}"
    warc_ts = _EPOCH + timedelta(seconds=rng.randrange(0, 14 * 86400))
    lang = "de" if rng.random() < 0.5 else "en"
    words = GERMAN_WORDS if lang == "de" else ENGLISH_WORDS

    sections = []
    clean_blocks: list[str] = []
    for _ in range(rng.randrange(2, 5)):
        title = _sentence(rng, words, rng.randrange(5, 8))[:-1]
        while len(title) < 26:  # stay above the content-length threshold
            title += " " + rng.choice(words)
        paras = [
            " ".join(
                _sentence(rng, words, rng.randrange(12, 40)) for _ in range(rng.randrange(1, 3))
            )
            for _ in range(rng.randrange(1, 4))
        ]
        clean_blocks.append(title)
        clean_blocks.extend(paras)
        noisy_paras = [_noisify(nrng, p, noise_rate) for p in paras]
        sections.append(
            f"<h2>{_noisify(nrng, title, noise_rate)}</h2>"
            + "".join(f"<p>{p}</p>" for p in noisy_paras)
        )
    clean_text = "\n".join(clean_blocks)

    related = "".join(
        f'<li><a href="/r/{k}">{_sentence(rng, words, rng.randrange(5, 9))}</a></li>'
        for k in range(rng.randrange(4, 9))
    )
    comments = "".join(
        f'<div class="c">{_sentence(rng, words, rng.randrange(4, 12))}</div>'
        for _ in range(rng.randrange(2, 6))
    )
    toc = _link_list(rng, rng.randrange(5, 10))
    html = (
        "<!DOCTYPE html><html><head><title>r</title><style>.c{}</style></head><body>"
        f"<nav>{toc}</nav>"
        f"<header><h1>{_sentence(rng, words, 3)[:-1]}</h1>{_link_list(rng, 4)}</header>"
        f"<main><article>{''.join(sections)}</article></main>"
        f'<aside class="related"><ul>{related}</ul></aside>'
        f'<aside class="comments">{comments}</aside>'
        f"<footer>{_link_list(rng, 7)}<p>copyright {rng.randrange(1990, 2025)}</p></footer>"
        "</body></html>"
    ).encode("utf-8")
    return Page(url=url, warc_ts=warc_ts, html=html, text=clean_text, lang=lang)


def generate_pages(
    n: int, seed: int = 42, noise_rate: float = 0.12, rich: bool = False
) -> list[Page]:
    maker = make_rich_page if rich else make_page
    return [maker(seed, i, noise_rate) for i in range(n)]


def pages_to_arrow(pages: list[Page]):
    """Arrow table with the canonical schema."""
    import pyarrow as pa

    return pa.table(
        {
            "url": pa.array([p.url for p in pages], pa.string()),
            "warc_ts": pa.array([p.warc_ts for p in pages], pa.timestamp("us", tz="UTC")),
            "html": pa.array([p.html for p in pages], pa.binary()),
            "text": pa.array([p.text for p in pages], pa.string()),
            "lang": pa.array([p.lang for p in pages], pa.string()),
        }
    )


def write_pages_parquet(path: str, n: int, seed: int = 42, noise_rate: float = 0.12) -> int:
    """Write n deterministic pages to one parquet file; returns n."""
    import pyarrow.parquet as pq

    pq.write_table(pages_to_arrow(generate_pages(n, seed, noise_rate)), path)
    return n
