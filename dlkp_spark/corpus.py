"""Deterministic synthetic Common-Crawl-style corpus (BASELINE.json input_hint).

Generates the authoritative input shape ``(url string, warc_ts timestamp,
html binary, text string, lang string)`` fully distributed: ``spark.range``
drives a ``mapInPandas`` generator whose randomness is a pure function of the
row index and the seed, so the corpus is byte-identical regardless of
partitioning, parallelism level, or regeneration — the property the per-row
"byte-identical extracted text per url" invariant is tested against.

Text is Zipf-sampled from a fixed vocabulary (realistic head-term skew so
head-term salting in the index build actually triggers); ~5% of rows embed
known multi-word keyphrases so the keyphrase field has guaranteed content.
``wrap_html`` renders each row's text into a realistic page (boilerplate
nav/footer/aside, script/style raw-text blocks, comments, inline markup,
character entities, escaped text nodes) that the real extractor in
``analysis/analyzer.py`` must invert exactly.
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

VOCAB_SIZE = 2000
ZIPF_A = 1.3  # Zipf exponent for term-frequency skew
EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
N_SITES = 64
LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "en", "en",
         "en", "en", "en", "en", "en", "en", "en", "en", "en", "de", "fr"]

# Known multi-word keyphrases embedded verbatim in ~5% of documents.
KNOWN_KEYPHRASES = [
    "neural keyphrase extraction",
    "inverted index compression",
    "block max wand",
    "distributed query engine",
    "conditional random field",
]


def vocab() -> list[str]:
    """Fixed vocabulary; rank i gets Zipf probability ∝ 1/(i+1)^a."""
    return [f"w{i:04d}" for i in range(VOCAB_SIZE)]


_VOCAB = np.array(vocab())
_RANKS = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
_ZIPF_P = (1.0 / _RANKS**ZIPF_A) / np.sum(1.0 / _RANKS**ZIPF_A)
_ZIPF_CDF = np.cumsum(_ZIPF_P)


def _row_text(i: int, seed: int) -> tuple[str, str]:
    """(text, lang) for row i — pure function of (i, seed)."""
    h = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=16).digest()
    rng = np.random.Generator(np.random.PCG64(int.from_bytes(h[:8], "big")))
    n_tokens = int(rng.integers(50, 400))
    # inverse-CDF Zipf sampling (vectorized)
    u = rng.random(n_tokens)
    toks = _VOCAB[np.searchsorted(_ZIPF_CDF, u)].tolist()
    if rng.random() < 0.05:
        kp = KNOWN_KEYPHRASES[int(rng.integers(0, len(KNOWN_KEYPHRASES)))]
        pos = int(rng.integers(0, n_tokens))
        toks[pos:pos] = kp.split()
    lang = LANGS[int(rng.integers(0, len(LANGS)))]
    return " ".join(toks), lang


def _url(i: int, seed: int) -> str:
    h = hashlib.blake2b(f"url:{seed}:{i}".encode(), digest_size=8).hexdigest()
    return f"https://site{i % N_SITES}.example/{h}"


# Boilerplate blocks a real Common-Crawl page carries and a real extractor
# must EXCLUDE — their words ("Home", "Terms", …) would corrupt the
# extracted text if any stage leaks them through.
_PAGE_NAV = ('<header class="site-head">\n'
             '  <nav id="top"><a href="/">Home</a> | <a href="/about">About'
             '</a> | <a href="/archive">Archive</a></nav>\n</header>\n')
_PAGE_FOOTER = ('<footer>\n  &copy; 2024 example corp &middot; '
                '<a href="/terms">Terms of Service</a>\n</footer>\n')
_PAGE_ASIDE = ('<aside class="ads">\n  <p>sponsored content ad unit</p>\n'
               '</aside>\n')
# raw-text elements: contents contain <, >, quotes and fake tags — a real
# extractor must drop them wholesale, not tag-strip them.
_PAGE_SCRIPT = ('<script type="text/javascript">\n'
                '  var hits = 0; if (hits < 1 && "</div>" !== "x") '
                '{ hits += 1; }\n</script>\n')
_PAGE_STYLE = ('<style>\n  body { margin: 0; } '
               '/* braces & angles: a<b, "quoted>" */\n</style>\n')
_INLINE_TAGS = ("b", "em", "strong")


def wrap_html(text: str, lang: str = "en", key: int = 0) -> bytes:
    """Deterministic Common-Crawl-style page renderer.

    Renders ``text`` into realistic html — head/title/meta, nav + footer
    + aside boilerplate, script/style blocks with raw ``<``/``>`` content,
    comments, attribute-carrying paragraph tags, inline markup around
    whole tokens, numeric character entities, and (for 3 of 4 keys) a
    ``<main>`` content wrapper — varying deterministically with ``key``.

    Round-trip contract (the BASELINE.json input_hint invariant):
    ``extract_text_py(wrap_html(t, lang, key)) == t`` for ANY
    whitespace-normalized ``t`` (tokens joined by single spaces, no
    leading/trailing whitespace) and any (lang, key); pinned per-url over
    the whole generated corpus by ``analyze(validate=True)`` and
    tests/test_corpus.py.
    """
    def esc(w: str) -> str:
        # text-node escaping, the part of rendering that makes the
        # round-trip hold for texts containing markup characters
        return w.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    toks = [esc(w) for w in text.split(" ")] if text else []
    h = hashlib.blake2b(f"page:{key}:{len(toks)}".encode(),
                        digest_size=16).digest()
    title = " ".join(toks[:6]) if toks else "untitled"
    attr_title = title.replace('"', "&quot;")

    paras: list[list[str]] = []
    i = 0
    while i < len(toks):
        step = 30 + (h[len(paras) % 16] % 50)
        paras.append(toks[i:i + step])
        i += step

    parts: list[str] = []
    for j, words in enumerate(paras):
        b = h[(j + 3) % 16]
        words = list(words)
        if words and b % 4 == 1:
            # numeric character entity on the first char of one token
            # (before inline markup so the wrap's own '<' is never escaped;
            # alnum-start only, so it never splits an &amp;-style escape)
            w = (b >> 3) % len(words)
            if words[w][:1].isalnum():
                c, rest = words[w][0], words[w][1:]
                ent = f"&#x{ord(c):x};" if b % 2 else f"&#{ord(c)};"
                words[w] = ent + rest
        if words and b % 3 == 0:
            # inline markup around one whole token (never intra-token)
            w = (b >> 2) % len(words)
            tag = _INLINE_TAGS[b % len(_INLINE_TAGS)]
            words[w] = f'<{tag} class="kw">{words[w]}</{tag}>'
        if b % 5 == 2:
            parts.append(f"<!-- p{j}: {len(words)} tokens -->")
        parts.append(f'<p id="p{j}" data-n="{len(words)}">\n  '
                     + " ".join(words) + "\n</p>")
        if b % 7 == 3:
            parts.append('<img src="/static/fig.png" alt="figure" />')
    content = "\n".join(parts)
    if key % 4 != 0:
        content = f'<main id="content">\n{content}\n</main>'

    page = (
        '<!DOCTYPE html>\n'
        f'<html lang="{lang}">\n<head>\n'
        '  <meta charset="utf-8">\n'
        f'  <meta name="description" content="{attr_title}">\n'
        f'  <title>{title}</title>\n'
        f'{_PAGE_STYLE}{_PAGE_SCRIPT}'
        '</head>\n<body>\n'
        f'{_PAGE_NAV}'
        f'{content}\n'
        f'{_PAGE_ASIDE if h[0] % 2 else ""}'
        f'{_PAGE_FOOTER}'
        '</body>\n</html>\n'
    )
    return page.encode("utf-8")


def generate_web_pages(spark: SparkSession, n_docs: int, seed: int = 42,
                       partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generator for the input_hint table."""
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                text, lang = _row_text(i, seed)
                rows.append((
                    _url(i, seed),
                    pd.Timestamp(EPOCH) + pd.Timedelta(seconds=int(i)),
                    wrap_html(text, lang=lang, key=i),
                    text,
                    lang,
                ))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    parts = partitions or max(8, spark.sparkContext.defaultParallelism)
    return spark.range(0, n_docs, numPartitions=parts).mapInPandas(gen, schema)


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver-provided stand-in table (doc_id, text, lang, source, n_chars)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def load_table(spark: SparkSession, path: str, fmt: str | None = None,
               schema: str | None = None) -> DataFrame:
    """Extension-dispatch loader (reference datasets/extraction.py:62-74
    dispatches on csv/json file extensions the same way).

    fmt overrides; otherwise the extension decides: .parquet / .json(l) /
    .csv. CSV reads with header=true; pass ``schema`` for typed CSV columns
    (inference costs an extra scan and is banned on the 100-TB path).
    A directory written by Spark (``part-*`` files) dispatches on the
    directory name's extension, matching how Spark writes datasets.
    """
    ext = (fmt or os.path.splitext(path.rstrip("/"))[1].lstrip(".")).lower()
    if ext in ("parquet", "pq"):
        return spark.read.parquet(path)
    if ext == "orc":
        return spark.read.orc(path)
    if ext in ("json", "jsonl"):
        r = spark.read
        if schema:
            r = r.schema(schema)
        return r.json(path)
    if ext in ("csv", "tsv"):
        r = spark.read.option("header", "true")
        if ext == "tsv":
            r = r.option("sep", "\t")
        if schema:
            r = r.schema(schema)
        else:
            r = r.option("inferSchema", "true")
        return r.csv(path)
    raise ValueError(f"unsupported source extension {ext!r} for {path}")
