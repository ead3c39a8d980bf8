"""Deterministic synthetic Common-Crawl-style page corpus (FIXTURES.md §1).

Stands in for nidaba's test fixture corpus (reference:
tests/resources/* sample page images + hOCR/TEI fixtures — SURVEY.md
§5.1): a generated set of pages whose expected extraction output is
computable independently of the pipeline, because every page is
assembled from numbered blocks with known content/boilerplate roles.

Everything is keyed off ``(seed, k)`` only — same call, same bytes, on
any machine. No external data (driver instruction).

Row schema (BASELINE.json input_hint):
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string
"""

from __future__ import annotations

import datetime as dt
import random

SEED = 42

LANGS = ["en", "fr", "es", "zh", "de"]
LANG_WEIGHTS = [0.45, 0.20, 0.15, 0.12, 0.08]

# Seeded vocabulary (mirrors the sandbox documents table's register).
VOCAB = (
    "the a of data query table scan join merge sort hash group window "
    "filter column row key value order part line item batch stream fast "
    "slow small large spark engine plan stage task shuffle partition "
    "broadcast skew salt bucket vector arrow pandas parquet iceberg "
    "crawl page block text span byte offset charset decode parse render "
    "content boiler nav footer header sidebar link anchor density words "
    "extract classify normalize checkpoint resume lineage metric"
).split()

NAV_WORDS = "home about contact products news blog login signup search help".split()


def _rng(k: int) -> random.Random:
    return random.Random(f"nidaba-corpus-{SEED}-{k}")


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(VOCAB) for _ in range(n))


def variant(k: int) -> str:
    """Edge-case routing (FIXTURES.md §1.1); precedence is part of the spec."""
    if k % 101 == 4:
        return "zero"
    if k % 101 == 0:
        return "emptybody"
    if k % 1009 == 5:
        return "mega"
    if k % 101 == 6:
        return "pdf2col"
    if _rng(k * 7919 + 13).random() < 0.07:
        return "pdf"
    if k % 101 == 1:
        return "broken"
    if k % 101 == 2:
        return "scriptwrap"
    if k % 101 == 3:
        return "nestedboiler"
    return "normal"


def _nav_html(rng: random.Random) -> str:
    items = "".join(
        f'<li><a href="/{w}">{w}</a></li>'
        for w in rng.sample(NAV_WORDS, rng.randint(3, 8))
    )
    return f"<nav><ul>{items}</ul></nav>"


def _sidebar_html(rng: random.Random) -> str:
    divs = []
    for _ in range(rng.randint(1, 4)):
        w1, w2 = rng.choice(NAV_WORDS), rng.choice(VOCAB)
        divs.append(f'<div class="ad"><a href="/x">{w1} {w2} deal</a></div>')
    return f"<aside>{''.join(divs)}</aside>"


def _footer_html(rng: random.Random) -> str:
    links = " ".join(f'<a href="/{w}">{w}</a>' for w in rng.sample(NAV_WORDS, 3))
    return f'<footer><p>© 2024 site{rng.randint(0, 96)} inc</p><div>{links}</div></footer>'


def _content_paras(rng: random.Random, n_min: int, n_max: int) -> list[str]:
    paras = []
    for _ in range(rng.randint(n_min, n_max)):
        body = _words(rng, rng.randint(20, 200))
        if rng.random() < 0.3:  # < 2 links per para (FIXTURES §1.1)
            w = rng.choice(VOCAB)
            body += f' see <a href="/ref">{w}</a> for more'
        paras.append(body)
    return paras


def _html_page(k: int, rng: random.Random, var: str) -> tuple[str, list[str]]:
    """Return (html_source, content_para_texts)."""
    n_min, n_max = (1000, 1000) if var == "mega" else (2, 12)
    paras = _content_paras(rng, n_min, n_max)
    para_html = [f"<p>{p}</p>" for p in paras]
    if var == "broken":
        para_html = [f"<p>{p}" for p in paras]  # unclosed <p> tags
    content = "".join(para_html)
    if var == "scriptwrap":
        content = (
            "<script>var x = 'not content';</script>"
            + f"<!-- hidden {rng.choice(VOCAB)} comment -->"
            + content
            + "<style>p { color: red }</style>"
        )
    if var == "nestedboiler":
        inner_nav = _nav_html(rng)
        content = f"<div>{para_html[0]}{inner_nav}{''.join(para_html[1:])}</div>"
    body = (
        ""
        if var == "emptybody"
        else _nav_html(rng) + f"<article>{content}</article>" + _sidebar_html(rng) + _footer_html(rng)
    )
    title = _words(rng, 3)
    html = (
        "<!DOCTYPE html><html><head><title>"
        + title
        + "</title>__META__</head><body>"
        + body
        + "</body></html>"
    )
    return html, paras


def _pdfx_page(k: int, rng: random.Random, two_col: bool) -> tuple[bytes, str]:
    """Return (payload_bytes, crawler_text). Runs shuffled on write."""
    w, h = 612.0, 792.0
    lines: list[tuple[float, float, str]] = []
    if two_col:
        n = rng.randint(4, 10)
        for i in range(n):
            lines.append((72.0 + rng.random() * 40, 90.0 + 14.0 * i, _words(rng, rng.randint(4, 9))))
        for i in range(rng.randint(4, 10)):
            lines.append((340.0 + rng.random() * 40, 90.0 + 14.0 * i, _words(rng, rng.randint(4, 9))))
    else:
        for i in range(rng.randint(5, 25)):
            lines.append((72.0 + rng.random() * 40, 90.0 + 14.0 * i, _words(rng, rng.randint(5, 12))))
    runs = []
    for x, y, text in lines:
        # split some lines into 2 runs to exercise x-sorting
        words = text.split()
        if len(words) > 6 and rng.random() < 0.5:
            mid = len(words) // 2
            runs.append((x, y, " ".join(words[:mid])))
            runs.append((x + 90.0, y, " ".join(words[mid:])))
        else:
            runs.append((x, y, text))
    rng.shuffle(runs)
    payload = "PDFX\n" + f"page {w:g} {h:g}\n" + "".join(
        f'run {x:g} {y:g} "{t}"\n' for x, y, t in runs
    )
    crawler_text = " ".join(t for _, _, t in runs)
    return payload.encode("utf-8"), crawler_text


def make_row(k: int) -> dict:
    """Generate row k of the pages table (pure function of k)."""
    rng = _rng(k)
    lang = rng.choices(LANGS, weights=LANG_WEIGHTS, k=1)[0]
    var = variant(k)
    url = f"https://site{k % 97}.example/{lang}/page{k}"
    warc_ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(seconds=37 * k)

    if var == "zero":
        html_bytes = b""
        crawler_text = _words(rng, rng.randint(10, 40))
    elif var in ("pdf", "pdf2col"):
        html_bytes, crawler_text = _pdfx_page(k, rng, two_col=(var == "pdf2col"))
    else:
        source, paras = _html_page(k, rng, var)
        enc_roll = _rng(k * 31 + 7).random()
        if enc_roll < 0.90:
            html_bytes = source.replace("__META__", '<meta charset="utf-8">').encode("utf-8")
        elif enc_roll < 0.98:
            source = source.replace("inc", "incorporée café", 1)
            html_bytes = source.replace("__META__", '<meta charset="iso-8859-1">').encode("latin-1", "replace")
        else:
            html_bytes = b"\xef\xbb\xbf" + source.replace("__META__", "").encode("utf-8")
        crawler_text = " ".join(paras)

    text_null = _rng(k * 53 + 29).random() < 0.05
    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": html_bytes,
        "text": None if text_null else crawler_text,
        "lang": lang,
    }


def generate_rows(n: int) -> list[dict]:
    return [make_row(k) for k in range(n)]


def write_pages_parquet(path: str, n: int) -> None:
    """Write the pages table with pyarrow (generator independent of Spark)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = generate_rows(n)
    schema = pa.schema(
        [
            pa.field("url", pa.string()),
            pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
            pa.field("html", pa.binary()),
            pa.field("text", pa.string()),
            pa.field("lang", pa.string()),
        ]
    )
    table = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(table, path)
