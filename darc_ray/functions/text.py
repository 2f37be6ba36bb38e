"""Text-analysis kernels for the training-data pipeline operators:
language ID (stopword/char heuristic), quality scoring, token
counting, document fingerprinting.  All vectorized per batch (pandas
str ops / numpy) — no model downloads, deterministic."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

_WORD_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)

_STOPWORDS = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "ich"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "que", "por", "para"},
}


def token_counts(texts: pd.Series) -> pd.DataFrame:
    """Whitespace tokens + a BPE-ish regex token count (words +
    punctuation marks), both int64."""
    ws = texts.str.split().map(len).astype("int64")
    bpe = texts.map(lambda t: len(_WORD_RE.findall(t))).astype("int64")
    return pd.DataFrame({"n_ws_tokens": ws, "n_re_tokens": bpe})


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Heuristic quality features (ratios in [0,1], float64):
    mean word length, stopword ratio (en), non-alpha ratio,
    unique-word ratio."""
    out = {}
    words = texts.str.lower().str.split()
    n_words = words.map(len).clip(lower=1)
    out["mean_word_len"] = (words.map(lambda ws: float(np.mean([len(w) for w in ws]))
                                      if ws else 0.0))
    en = _STOPWORDS["en"]
    out["stopword_ratio"] = words.map(
        lambda ws: sum(w in en for w in ws) / max(1, len(ws)))
    out["nonalpha_ratio"] = texts.map(
        lambda t: sum(not (c.isalpha() or c.isspace()) for c in t) / max(1, len(t)))
    out["unique_ratio"] = words.map(lambda ws: len(set(ws)) / max(1, len(ws)))
    df = pd.DataFrame(out)
    df["quality"] = ((1.0 - df["nonalpha_ratio"])
                     * (0.5 + 0.5 * df["unique_ratio"])).clip(0.0, 1.0)
    return df


def lang_id(texts: pd.Series) -> pd.Series:
    """n-gram/stopword language heuristic: CJK chars → zh; else the
    stopword set with most hits; ties/no-hits → en."""
    def _one(t: str) -> str:
        if any("一" <= c <= "鿿" for c in t[:400]):
            return "zh"
        ws = set(t.lower().split())
        best, best_n = "en", 0
        for lang in ("en", "de", "fr", "es"):
            n = len(ws & _STOPWORDS[lang])
            if n > best_n:
                best, best_n = lang, n
        return best

    return texts.map(_one)


def md5_fingerprint(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: hashlib.md5(t.encode()).hexdigest())


_B = 1000003
_MASK = (1 << 64) - 1


def rolling_fingerprint(texts: pd.Series) -> pd.Series:
    """64-bit polynomial rolling hash over the word sequence
    (order-sensitive document fingerprint).  Word hash = first 8 bytes
    of md5 so the DuckDB oracle reproduces it exactly (list_reduce over
    the word list with the same multiply-mask-xor step)."""
    def _one(t: str) -> int:
        h = 1469598103934665603
        for w in t.split():
            wh = int(hashlib.md5(w.encode()).hexdigest()[:16], 16)
            h = ((h * _B) & _MASK) ^ wh
        return h & 0x7FFFFFFFFFFFFFFF                   # keep int64-positive

    return texts.map(_one)


def word_shingles(text: str, k: int = 3) -> set[str]:
    ws = text.split()
    if len(ws) < k:
        return {" ".join(ws)} if ws else set()
    return {" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)}


# ---------------------------------------------------------------------------
# PII redaction (training-data scrubbing: emails / IPv4 / phone numbers)
# ---------------------------------------------------------------------------
# ASCII-only patterns chosen so Python `re` and DuckDB's RE2 agree
# exactly (same leftmost non-overlapping matches, same greedy classes);
# counts are taken over the ORIGINAL text, then the three redactions
# apply sequentially (email -> ipv4 -> phone), so the definition is
# order-unambiguous on both engines.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+\d{2}-\d{3}-\d{4}"


def pii_redact(texts: pd.Series) -> pd.DataFrame:
    """Vectorized PII scrub: per-doc match counts (int64, over the
    original text) + the redacted text after the three sequential
    replacements.  Stateless, batch-local — the 100 TB shape is a pure
    map with zero shuffle."""
    n_email = texts.str.count(PII_EMAIL_RE).astype("int64")
    n_ipv4 = texts.str.count(PII_IPV4_RE).astype("int64")
    n_phone = texts.str.count(PII_PHONE_RE).astype("int64")
    red = (texts.str.replace(PII_EMAIL_RE, "<EMAIL>", regex=True)
                .str.replace(PII_IPV4_RE, "<IP>", regex=True)
                .str.replace(PII_PHONE_RE, "<PHONE>", regex=True))
    return pd.DataFrame({"n_email": n_email, "n_ipv4": n_ipv4,
                         "n_phone": n_phone, "redacted": red})


PII_FIXTURE = "/tmp/darc_ray_fixtures/text_pii.parquet"


def ensure_pii_fixture(path: str = PII_FIXTURE) -> str:
    """Deterministic PII corpus (the sf documents table is digit-free
    word soup, so scrubbing needs planted positives): 400 docs of word
    soup with seeded emails / dotted-quad IPs / +CC-XXX-XXXX phones —
    some docs clean, some repeating the same address, counts 0-3 per
    kind.  Fixed path + atomic write, sf-independent (same contract as
    the image fixtures in stages/multimodal.py)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    vocab = ("alpha beta gamma delta sigma lambda tensor vector matrix "
             "stream batch shard merge scan probe build spill flush").split()
    docs = []
    for d in range(400):
        rng = np.random.default_rng(7300 + d)
        words = list(rng.choice(vocab, size=int(rng.integers(12, 40))))
        for _ in range(int(rng.integers(0, 3))):        # emails
            w = f"user{int(rng.integers(1, 500))}@example{int(rng.integers(1, 9))}.com"
            words.insert(int(rng.integers(0, len(words))), w)
        for _ in range(int(rng.integers(0, 3))):        # IPv4s
            w = ".".join(str(int(rng.integers(0, 256))) for _ in range(4))
            words.insert(int(rng.integers(0, len(words))), w)
        for _ in range(int(rng.integers(0, 3))):        # phones
            w = (f"+{int(rng.integers(10, 100))}-{int(rng.integers(100, 1000))}"
                 f"-{int(rng.integers(1000, 10000))}")
            words.insert(int(rng.integers(0, len(words))), w)
        docs.append(" ".join(words))
    table = pa.Table.from_pydict({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)                      # atomic on POSIX
    return path


LINES_FIXTURE = "/tmp/darc_ray_fixtures/text_lines.parquet"


def ensure_lines_fixture(path: str = LINES_FIXTURE) -> str:
    """Deterministic multi-line corpus for boilerplate-line removal
    (the sf documents table is single-line): 300 docs of 6-18 lines;
    ~90% of docs share a small set of header/footer/banner lines
    (corpus-frequent = boilerplate), a few lines recur at mid frequency
    (below threshold, must survive), the body lines are doc-unique.
    Fixed path + atomic write, sf-independent."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    boiler = ["accept all cookies to continue",
              "copyright example corp all rights reserved",
              "subscribe to our newsletter for updates",
              "home products pricing about contact"]
    midfreq = [f"promo banner variant {i}" for i in range(6)]   # ~15 docs each
    vocab = ("quark lepton boson hadron meson photon gluon charm strange "
             "truth beauty spin charge mass field flux decay orbit").split()
    docs = []
    for d in range(300):
        rng = np.random.default_rng(6400 + d)
        lines = []
        if rng.random() < 0.9:
            lines.append(boiler[int(rng.integers(0, 2))])       # header
        if rng.random() < 0.05:
            lines.append(midfreq[int(rng.integers(0, len(midfreq)))])
        for _ in range(int(rng.integers(4, 14))):               # unique body
            lines.append(" ".join(rng.choice(vocab,
                                             size=int(rng.integers(5, 12))))
                         + f" #{d}")
        if rng.random() < 0.9:
            lines.append(boiler[2 + int(rng.integers(0, 2))])   # footer
        docs.append("\n".join(lines))
    table = pa.Table.from_pydict({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)                      # atomic on POSIX
    return path


REPETITION_FIXTURE = "/tmp/darc_ray_fixtures/text_repetition.parquet"


def ensure_repetition_fixture(path: str = REPETITION_FIXTURE) -> str:
    """Deterministic corpus with PLANTED repetition for the Gopher-style
    repetition rules (ref quality heuristics are per-page scalar checks,
    `darc/parse.py` has none — this is the training-data extension):
    240 docs in four styles — clean (unique lines), line-spam (one line
    repeated 2-5×), 2-gram-spam (a two-word phrase repeated 5-15× in a
    line), 5-gram-spam (a five-word phrase recurring 3-8× across lines).
    Fixed path + atomic write, sf-independent, no RNG state shared
    across docs (rng seeded per doc)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    vocab = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa quebec romeo "
             "sierra tango uniform victor whiskey xray yankee zulu").split()
    docs = []
    for d in range(240):
        rng = np.random.default_rng(9300 + d)
        mkline = lambda n: " ".join(rng.choice(vocab, size=n)) + f" #{d}"
        lines = [mkline(int(rng.integers(6, 12)))
                 for _ in range(int(rng.integers(5, 10)))]
        style = d % 4
        if style == 1:                           # line spam
            victim = lines[int(rng.integers(0, len(lines)))]
            for _ in range(int(rng.integers(2, 5))):
                lines.insert(int(rng.integers(0, len(lines) + 1)), victim)
        elif style == 2:                         # 2-gram spam
            phrase = " ".join(rng.choice(vocab, size=2))
            reps = int(rng.integers(5, 16))
            lines.insert(int(rng.integers(0, len(lines) + 1)),
                         " ".join([phrase] * reps))
        elif style == 3:                         # 5-gram spam
            phrase = " ".join(rng.choice(vocab, size=5))
            for _ in range(int(rng.integers(3, 9))):
                lines.insert(int(rng.integers(0, len(lines) + 1)),
                             phrase + " " + mkline(3))
        docs.append("\n".join(lines))
    table = pa.Table.from_pydict({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)                      # atomic on POSIX
    return path


HTML_FIXTURE = "/tmp/darc_ray_fixtures/text_html.parquet"


def ensure_html_fixture(path: str = HTML_FIXTURE) -> str:
    """Deterministic HTML corpus for the html_text extraction family
    (the crawl corpus pages exist, but a fixed-path fixture keeps the
    SQL oracle engine-independent like the other trilogies): 200 docs
    mixing nested markup, <script>/<style> blocks (with angle brackets
    inside!), HTML comments, the five standard entities, attributes
    with '>' in quoted values excluded by design (the tag regex is the
    documented extraction contract, not a full HTML5 parser — same
    class of contract as the reference's URL regexes)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    vocab = ("web corpus training data quality filter dedupe token "
             "model crawl render fetch parse index shard batch").split()
    docs = []
    for d in range(200):
        rng = np.random.default_rng(11000 + d)
        words = lambda n: " ".join(rng.choice(vocab, size=n))
        parts = [f"<html><head><title>{words(3)} #{d}</title>"]
        if d % 3 == 0:
            parts.append("<script>if (a < b && c > d) { spam(); }</script>")
        if d % 4 == 0:
            parts.append("<style>p { margin: 0; } /* x < y */</style>")
        parts.append("</head><body>")
        if d % 5 == 0:
            parts.append(f"<!-- hidden {words(2)} comment -->")
        for _ in range(int(rng.integers(2, 6))):
            tag = ["p", "div", "li", "h2"][int(rng.integers(0, 4))]
            ent = ["&amp;", "&lt;", "&gt;", "&quot;", "&#39;"][
                int(rng.integers(0, 5))]
            parts.append(f"<{tag} class=\"c{d}\">{words(int(rng.integers(4, 9)))}"
                         f" {ent} {words(2)}</{tag}>")
        parts.append("</body></html>")
        docs.append("\n".join(parts))
    table = pa.Table.from_pydict({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)                      # atomic on POSIX
    return path


CAPTION_LANG_FIXTURE = "/tmp/darc_ray_fixtures/caption_lang.parquet"


def ensure_caption_lang_fixture(path: str = CAPTION_LANG_FIXTURE) -> str:
    """Deterministic multilingual caption corpus for the language-mix
    dataset-card family: 26 captions cycling five planted languages —
    en / de / fr / es (each with an unambiguous stopword majority for
    the ``lang_id`` argmax, respecting the shared fr/es tokens) and zh
    (CJK chars trip the first branch) — plus one stopword-free junk
    caption that exercises the en default.  Fixed path + atomic write
    + ALWAYS rewritten, sf-independent (same contract as the other
    text fixtures)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    templates = [
        "the harbor of a quiet town in the rain and it is calm for hours",
        "der alte turm und die laterne ist nicht ein traum ich gehe zu "
        "abend mit freude",
        "le vieux pont et les toits est un reve des artistes que "
        "pour toujours",
        "el mercado los farolillos las flores es una tarde que por "
        "para siempre",
        "城市的黄昏有一座桥",
    ]
    fillers = ["photo", "view", "scene", "shot", "frame"]
    rows_id, rows_cap = [], []
    for i in range(25):
        rows_id.append(f"lang-{i:02d}")
        rows_cap.append(f"{fillers[(i // 5) % 5]} {i:02d} "
                        f"{templates[i % 5]}")
    rows_id.append("lang-99-junk")
    rows_cap.append("zzz qqq 12345 ---")
    table = pa.Table.from_pydict({
        "image_id": pa.array(rows_id, pa.string()),
        "caption": pa.array(rows_cap, pa.string()),
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)                      # atomic on POSIX
    return path


CAPTION_TEMPLATE_FIXTURE = "/tmp/darc_ray_fixtures/caption_template.parquet"


def ensure_caption_template_fixture(path: str = CAPTION_TEMPLATE_FIXTURE) -> str:
    """Deterministic caption corpus for the template-spam family: a
    planted mix of alt-text boilerplate groups — 12 ``stock photo of
    …`` rows (10 distinct tails + 2 exact repeats), 6 distinct
    ``royalty free image …`` rows, 4 byte-identical ``click to
    enlarge`` rows, 4 identical single-token ``new`` rows (the
    shorter-than-prefix path) — plus sub-threshold noise: 3 ``best
    wallpaper hd …`` rows (n=3 < 4) and 8 one-off unique captions.
    Case/whitespace variants are planted so the lower/trim
    normalization is load-bearing.  Fixed path + atomic write +
    ALWAYS rewritten, sf-independent (same contract as the other text
    fixtures)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    caps: list[str] = []
    nouns = ["harbor", "bridge", "market", "forest", "tower",
             "lantern", "garden", "canyon", "library", "station"]
    for k, n in enumerate(nouns):
        caps.append(f"Stock Photo of {n} at dusk {k}")
    caps.append("stock photo of harbor at dusk 0")      # exact repeat
    caps.append("  stock photo of harbor at dusk 0  ")  # trim variant
    for k in range(6):
        caps.append(f"royalty free image number {k}")
    caps.extend(["click to enlarge"] * 4)
    caps.extend(["new"] * 4)
    for k in range(3):
        caps.append(f"best wallpaper hd {k}")
    caps.extend([
        "a quiet sunrise over the bay",
        "two dogs playing in fresh snow",
        "vintage bicycle leaning on a wall",
        "macro shot of a dew covered leaf",
        "night skyline reflected in the river",
        "children flying kites on the beach",
        "old map spread across a desk",
        "steam rising from a mountain hut",
    ])
    table = pa.Table.from_pydict({
        "image_id": pa.array([f"tpl-{i:02d}" for i in range(len(caps))],
                             pa.string()),
        "caption": pa.array(caps, pa.string()),
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)                      # atomic on POSIX
    return path


CAPTION_DIMS_FIXTURE = "/tmp/darc_ray_fixtures/caption_dims.parquet"


def ensure_caption_dims_fixture(path: str = CAPTION_DIMS_FIXTURE) -> str:
    """Deterministic (image_id, w, h, caption) manifest for the
    resolution-spam gate: ``-match`` rows mention exactly their
    manifest dims ("wallpaper 1920x1080"), ``-lie`` rows advertise a
    resolution the manifest contradicts (the wallpaper-spam shape),
    ``-none`` rows have no WxH mention, one ``dim-lego`` row contains
    "2x4" (single digits — below the 2-digit floor, must NOT match)
    and one ``dim-small`` row mentions "12x34" (2 digits — must
    match).  Fixed path + atomic write + ALWAYS rewritten,
    sf-independent (same contract as the other text fixtures)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    ids, ws, hs, caps = [], [], [], []

    def add(iid: str, w: int, h: int, cap: str) -> None:
        ids.append(iid)
        ws.append(w)
        hs.append(h)
        caps.append(cap)

    dims = [(1920, 1080), (1280, 720), (3840, 2160), (800, 600),
            (1024, 768), (640, 480)]
    for i, (w, h) in enumerate(dims):
        if i % 3 == 0:
            add(f"dim-{i:02d}-match", w, h,
                f"free desktop wallpaper {w}x{h} hd download")
        elif i % 3 == 1:
            add(f"dim-{i:02d}-lie", 320, 240,
                f"ultra hd wallpaper {w}x{h} best quality")
        else:
            add(f"dim-{i:02d}-none", w, h,
                f"a painted {i:02d} landscape with hills and a river")
    add("dim-lego", 400, 300, "macro photo of a 2x4 lego brick")
    add("dim-small", 200, 100, "seamless 12x34 tile pattern swatch")

    table = pa.Table.from_pydict({
        "image_id": pa.array(ids, pa.string()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "caption": pa.array(caps, pa.string()),
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)                      # atomic on POSIX
    return path


CAPTION_EDITDUP_FIXTURE = "/tmp/darc_ray_fixtures/caption_editdup.parquet"


def ensure_caption_editdup_fixture(path: str = CAPTION_EDITDUP_FIXTURE) -> str:
    """Deterministic caption corpus for the deletion-1 neighborhood
    join: planted groups at token-level edit distance ≤ 1 — an exact
    duplicate, a one-token SUBSTITUTION pair (dawn/dusk), a one-token
    DELETION pair (leading article dropped), a second substitution
    pair (over/under), two single-token captions plus their two-token
    superset (the empty-variant trap: "cat" and "dog" must NOT pair
    with each other, both must pair with "cat dog"), and unrelated
    singletons.  Fixed path + atomic write + ALWAYS rewritten,
    sf-independent (same contract as the other text fixtures)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    caps = {
        "ed-0": "a quiet harbor at dawn",
        "ed-1": "a quiet harbor at dusk",
        "ed-2": "quiet harbor at dawn",
        "ed-3": "a quiet harbor at dawn",
        "ed-4": "the old stone bridge over water",
        "ed-5": "the old stone bridge under water",
        "ed-6": "totally unrelated caption here",
        "ed-7": "cat",
        "ed-8": "cat dog",
        "ed-9": "dog",
    }
    table = pa.Table.from_pydict({
        "image_id": pa.array(list(caps), pa.string()),
        "caption": pa.array(list(caps.values()), pa.string()),
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)                      # atomic on POSIX
    return path


CAPTION_STUFFING_FIXTURE = "/tmp/darc_ray_fixtures/caption_stuffing.parquet"


def ensure_caption_stuffing_fixture(path: str = CAPTION_STUFFING_FIXTURE) -> str:
    """Deterministic caption corpus for the keyword-stuffing gate:
    ``-stuffed`` rows repeat one token 3-5 times ("cheap cheap cheap
    …" — the SEO shape), ``-lowuniq`` rows alternate two tokens (no
    single token hits the repeat floor but the unique ratio collapses),
    ``-clean`` rows are all-distinct, one ``stf-case`` row repeats
    with case variants (normalization is load-bearing), and one
    ``stf-single`` single-token row pins the n=1 edge (ratio 1000,
    never flagged).  Fixed path + atomic write + ALWAYS rewritten,
    sf-independent (same contract as the other text fixtures)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    caps: dict[str, str] = {}
    for i in range(4):
        caps[f"stf-{i:02d}-stuffed"] = (
            f"buy {'cheap ' * (3 + i)}designer watches online {i}")
    for i in range(3):
        caps[f"stf-{i:02d}-lowuniq"] = (f"tone{i} ring{i} " * 2).strip()
    for i in range(5):
        caps[f"stf-{i:02d}-clean"] = (
            f"a painted landscape number {i} with hills beside the river")
    caps["stf-case"] = "SALE sale Sale final clearance"
    caps["stf-single"] = "minimalism"
    table = pa.Table.from_pydict({
        "image_id": pa.array(list(caps), pa.string()),
        "caption": pa.array(list(caps.values()), pa.string()),
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)                      # atomic on POSIX
    return path


CAPTION_BLOCKLIST_FIXTURE = "/tmp/darc_ray_fixtures/caption_blocklist.parquet"

# the policy wordlist itself is part of the family's contract (the
# SQL oracle inlines the same constant list); a production run would
# ray.put() the compiled set once and read it in every task
BLOCKLIST_TERMS = ("casino", "viagra", "torrent", "crack", "warez",
                   "gamble", "escort", "counterfeit")


def ensure_caption_blocklist_fixture(path: str = CAPTION_BLOCKLIST_FIXTURE) -> str:
    """Deterministic caption corpus for the policy-blocklist gate:
    ``-hit1`` rows contain one blocklisted term, ``-hit3`` rows stack
    three, ``-clean`` rows contain none, one ``blk-sub`` row contains
    a blocklisted term only as a SUBSTRING of a longer token
    ("cracker" — whole-token matching must NOT flag it) and one
    ``blk-case`` row hits via case variants.  Fixed path + atomic
    write + ALWAYS rewritten, sf-independent (same contract as the
    other text fixtures)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    caps: dict[str, str] = {}
    for i in range(4):
        caps[f"blk-{i:02d}-hit1"] = (
            f"play {BLOCKLIST_TERMS[i]} games online now {i}")
    for i in range(2):
        caps[f"blk-{i:02d}-hit3"] = (
            f"{BLOCKLIST_TERMS[3 * i]} {BLOCKLIST_TERMS[3 * i + 1]} best "
            f"{BLOCKLIST_TERMS[3 * i + 2]} deals {i}")
    for i in range(6):
        caps[f"blk-{i:02d}-clean"] = (
            f"a watercolor study {i} of boats resting in the harbor")
    caps["blk-sub"] = "a cracker tin and a tort on the table"
    caps["blk-case"] = "CASINO lights over the Viagra falls sign"
    table = pa.Table.from_pydict({
        "image_id": pa.array(list(caps), pa.string()),
        "caption": pa.array(list(caps.values()), pa.string()),
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)                      # atomic on POSIX
    return path


MOJIBAKE_LITERALS = ("\u00c3\u00a9", "\u00c3\u00bc", "\u00c3\u00b1",
                     "\u00e2\u0080\u0099", "\u00e2\u0080\u009c")

ENTITY_FIXTURE = "/tmp/darc_ray_fixtures/text_entities.parquet"


def ensure_entity_fixture(path: str = ENTITY_FIXTURE) -> str:
    """Deterministic HTML-entity-residue corpus (the sf documents
    table carries no entities, so the gate needs planted positives):
    280 docs of word soup seeded with named entities (&amp; &lt;
    &nbsp; ...), decimal/hex numeric refs (&#65; &#x41;), DOUBLE-
    escaped residue (&amp;amp; &amp;lt; — the tell of a pipeline that
    escaped twice), and bare ampersands (AT&T, R&D) that must NOT
    count; some docs clean, some lightly touched (under the flag
    threshold), some entity-saturated.  Fixed path + atomic write +
    always rewritten, sf-independent."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    vocab = ("alpha beta gamma delta sigma lambda tensor vector matrix "
             "stream batch shard merge scan probe build spill flush").split()
    named = ["&amp;", "&lt;", "&gt;", "&nbsp;", "&quot;", "&frac12;"]
    numeric = ["&#65;", "&#8212;", "&#x41;", "&#x2014;"]
    double = ["&amp;amp;", "&amp;lt;", "&amp;nbsp;"]
    bare = ["AT&T", "R&D", "a & b"]
    docs = []
    for d in range(280):
        rng = np.random.default_rng(9300 + d)
        words = list(rng.choice(vocab, size=int(rng.integers(20, 60))))
        kind = d % 5
        if kind == 1:                          # light named: 1-3
            for _ in range(int(rng.integers(1, 4))):
                words.insert(int(rng.integers(0, len(words))),
                             named[int(rng.integers(0, len(named)))])
        elif kind == 2:                        # numeric refs: 1-4
            for _ in range(int(rng.integers(1, 5))):
                words.insert(int(rng.integers(0, len(words))),
                             numeric[int(rng.integers(0, len(numeric)))])
        elif kind == 3:                        # double-escape residue
            for _ in range(int(rng.integers(1, 3))):
                words.insert(int(rng.integers(0, len(words))),
                             double[int(rng.integers(0, len(double)))])
        elif kind == 4:                        # saturated multi-kind
            for _ in range(int(rng.integers(6, 12))):
                pool = named + numeric
                words.insert(int(rng.integers(0, len(words))),
                             pool[int(rng.integers(0, len(pool)))])
        # every doc gets bare-& decoys that must not count
        for _ in range(int(rng.integers(0, 3))):
            words.insert(int(rng.integers(0, len(words))),
                         bare[int(rng.integers(0, len(bare)))])
        docs.append(" ".join(words))
    table = pa.table({
        "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
        "text": pa.array(docs),
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)                      # atomic on POSIX
    return path


def entity_features(texts: pd.Series) -> pd.DataFrame:
    """Vectorized HTML-entity-residue signals per doc: named /
    decimal / hex entity counts (three DISJOINT patterns — prefixes
    differ at the second character, so no alternation-order semantics
    can diverge between re and RE2), double-escape count
    (&amp;<name>; — overlaps the named count by construction, kept as
    its own signal), entity character mass, per-mille over codepoint
    length, and the gate flag (any double-escape OR >= 50 permille
    entity mass)."""
    n = texts.str.len().astype("int64")
    named = texts.str.findall(r"&[a-zA-Z][a-zA-Z0-9]*;")
    dec_e = texts.str.findall(r"&#[0-9]+;")
    hex_e = texts.str.findall(r"&#[xX][0-9a-fA-F]+;")
    n_named = named.map(len).astype("int64")
    n_numeric = (dec_e.map(len) + hex_e.map(len)).astype("int64")
    n_double = texts.str.count(r"&amp;[a-zA-Z][a-zA-Z0-9]*;").astype("int64")
    chars = (named.map(lambda l: sum(map(len, l)))
             + dec_e.map(lambda l: sum(map(len, l)))
             + hex_e.map(lambda l: sum(map(len, l)))).astype("int64")
    milli = (chars * 1000 // n.clip(lower=1)).astype("int64")
    flag = ((n_double > 0) | (milli >= 50)).astype("int64")
    return pd.DataFrame({
        "n_chars": n, "n_named": n_named, "n_numeric": n_numeric,
        "n_double": n_double, "entity_chars": chars,
        "entity_milli": milli, "escaped": flag})


MOJIBAKE_FIXTURE = "/tmp/darc_ray_fixtures/text_mojibake.parquet"


def ensure_mojibake_fixture(path: str = MOJIBAKE_FIXTURE) -> str:
    """Deterministic encoding-damage corpus (the sf documents table is
    clean ASCII, so the gate needs planted positives): 300 docs of
    word soup seeded with U+FFFD replacement chars (decode loss), C1
    control chars U+0080-U+009F (Windows-1252 bytes mis-tagged as
    Latin-1) and classic UTF-8-read-as-Latin-1 digraphs (A-tilde-e,
    a-circumflex quote pairs, ...) - some docs clean, some lightly
    touched (must stay under the flag thresholds), some saturated.
    Fixed path + atomic write + always rewritten, sf-independent."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    vocab = ("alpha beta gamma delta sigma lambda tensor vector matrix "
             "stream batch shard merge scan probe build spill flush").split()
    c1_chars = ["\u0085", "\u0092", "\u009d"]
    fffd = "\ufffd"
    docs = []
    for d in range(300):
        rng = np.random.default_rng(9100 + d)
        words = list(rng.choice(vocab, size=int(rng.integers(20, 60))))
        kind = d % 5
        if kind == 1:                          # fffd: 1-4 marks
            for _ in range(int(rng.integers(1, 5))):
                words.insert(int(rng.integers(0, len(words))),
                             "lo" + fffd + "st")
        elif kind == 2:                        # C1 controls: 1-6 marks
            for _ in range(int(rng.integers(1, 7))):
                ch = c1_chars[int(rng.integers(0, len(c1_chars)))]
                words.insert(int(rng.integers(0, len(words))),
                             "wi" + ch + "de")
        elif kind == 3:                        # mojibake digraphs
            for _ in range(int(rng.integers(1, 5))):
                lit = MOJIBAKE_LITERALS[
                    int(rng.integers(0, len(MOJIBAKE_LITERALS)))]
                words.insert(int(rng.integers(0, len(words))),
                             "caf" + lit)
        elif kind == 4:                        # saturated multi-kind
            for _ in range(int(rng.integers(3, 8))):
                words.insert(int(rng.integers(0, len(words))),
                             fffd + fffd)
            for _ in range(int(rng.integers(2, 5))):
                lit = MOJIBAKE_LITERALS[
                    int(rng.integers(0, len(MOJIBAKE_LITERALS)))]
                words.insert(int(rng.integers(0, len(words))), lit)
        docs.append(" ".join(words))
    table = pa.Table.from_pydict({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)                      # atomic on POSIX
    return path


def mojibake_features(texts: pd.Series) -> pd.DataFrame:
    """Vectorized encoding-damage signals per doc: U+FFFD count, C1
    control count (U+0080-U+009F), mojibake digraph count (fixed
    literal set shared with the DuckDB oracle), codepoint length,
    damage per-mille and the gate flag (>= 5 permille damage OR >= 3
    FFFDs)."""
    import re

    n = texts.str.len().astype("int64")
    n_fffd = texts.str.count("\ufffd").astype("int64")
    n_c1 = texts.str.count("[\u0080-\u009f]").astype("int64")
    n_moji = sum(texts.str.count(re.escape(lit))
                 for lit in MOJIBAKE_LITERALS).astype("int64")
    damage = ((n_fffd + n_c1 + n_moji) * 1000 // n.clip(lower=1)) \
        .astype("int64")
    flag = ((damage >= 5) | (n_fffd >= 3)).astype("int64")
    return pd.DataFrame({"n_chars": n, "n_fffd": n_fffd, "n_c1": n_c1,
                         "n_moji": n_moji, "damage_milli": damage,
                         "is_damaged": flag})


STITCH_FIXTURE = "/tmp/darc_ray_fixtures/text_stitch.parquet"


def ensure_stitch_fixture(path: str = STITCH_FIXTURE) -> str:
    """Deterministic shard-boundary corpus for the stitch-dup family:
    240 word-soup docs; several CHAINS of length 2-4 where each link's
    last 5 words equal the next link's first 5 words (a document split
    across shard boundaries and re-ingested twice), one 3-way fan
    (one suffix continued by TWO different docs), short docs (< 5
    words, must be excluded), and clean docs.  Fixed path + atomic
    write + always rewritten, sf-independent."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    vocab = ("alpha beta gamma delta sigma lambda tensor vector matrix "
             "stream batch shard merge scan probe build spill flush "
             "queue spine crest ridge basin").split()

    def soup(seed: int, n: int) -> list[str]:
        rng = np.random.default_rng(seed)
        return list(rng.choice(vocab, size=n))

    docs: dict[int, str] = {}
    did = 0
    for c, chain_len in enumerate((2, 3, 4, 2, 3)):    # chains
        boundary = soup(5000 + 31 * c, 5)
        body = soup(5100 + 31 * c, 18)
        docs[did] = " ".join(body + boundary)
        did += 1
        for link in range(1, chain_len):
            nxt_boundary = soup(5000 + 31 * c + link, 5)
            body = soup(5200 + 31 * c + 7 * link, 15)
            docs[did] = " ".join(boundary + body
                                 + (nxt_boundary if link < chain_len - 1
                                    else []))
            boundary = nxt_boundary
            did += 1
    fan = soup(5900, 5)                                 # 3-way fan
    docs[did] = " ".join(soup(5901, 12) + fan); did += 1
    docs[did] = " ".join(fan + soup(5902, 10)); did += 1
    docs[did] = " ".join(fan + soup(5903, 14)); did += 1
    for s in range(4):                                  # short docs
        docs[did] = " ".join(soup(5950 + s, 3)); did += 1
    while did < 240:                                    # clean docs
        docs[did] = " ".join(soup(6000 + did, int(12 + did % 9)))
        did += 1
    table = pa.Table.from_pydict({
        "doc_id": pa.array(sorted(docs), pa.int64()),
        "text": pa.array([docs[k] for k in sorted(docs)], pa.string()),
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)                      # atomic on POSIX
    return path


URL_FIXTURE = "/tmp/darc_ray_fixtures/urls.parquet"


def ensure_url_fixture(path: str = URL_FIXTURE) -> str:
    """Deterministic URL-variant corpus for the canonicalization-dedup
    family (the driver tables carry no URL column): 60 canonical pages
    (10 hosts × 6 paths, some with real query params), each emitted in
    1-4 planted variants — tracking params injected (utm_* / fbclid /
    gclid / ref / mc_cid / mc_eid) in shuffled order, host upper-cased,
    default port (:80 / :443) spelled out, fragments appended — plus
    decoys that must NOT collapse or strip: a different NON-tracking
    param value, `referrer=` (prefix of `ref` but a different key —
    the `^ref=` boundary), `/ref/` as a PATH segment, and a pair
    differing only in path case.  ASCII-only, all well-formed http(s),
    every query segment of k=v form — so byte order, RE2/`re` and
    DuckDB/pandas sorts cannot diverge.  Fixed path + atomic write +
    always rewritten, sf-independent."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    tracking = ["utm_source=news", "utm_campaign=q3", "fbclid=AbC123",
                "gclid=xYz9", "ref=nav", "mc_cid=77", "mc_eid=88"]
    rows: list[str] = []
    for h in range(10):
        for p in range(6):
            page = h * 6 + p
            rng = np.random.default_rng(41_000 + page)
            base_params = (["a=1", "b=2"] if page % 3 == 0
                           else (["page=3"] if page % 3 == 1 else []))
            root = f"site{h}.example"
            pathp = f"/p/{p}"
            n_var = 1 + page % 4
            for v in range(n_var):
                scheme = "https" if page % 2 == 0 else "http"
                host = root
                params = list(base_params)
                frag = ""
                if v >= 1:                     # tracking noise, shuffled
                    extra = list(rng.choice(tracking, size=int(
                        rng.integers(1, 4)), replace=False))
                    params = params + extra
                    rng.shuffle(params)
                if v == 2:                     # shouting host + port
                    host = root.upper() + (":443" if scheme == "https"
                                           else ":80")
                    frag = "#section-2"
                if v == 3:
                    frag = "#top"
                q = ("?" + "&".join(params)) if params else ""
                rows.append(f"{scheme}://{host}{pathp}{q}{frag}")
    # decoys
    rows += [
        "https://site0.example/p/0?a=1&b=3",          # value differs: new page
        "https://site1.example/p/1?page=3&referrer=x",  # referrer= kept
        "https://site2.example/ref/2",                # ref as path segment
        "https://site3.example/P/3",                  # path case significant
        "https://site3.example/p/3",
    ]
    table = pa.table({
        "url_id": pa.array(np.arange(len(rows), dtype=np.int64)),
        "url": pa.array(rows)})
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)                      # atomic on POSIX
    return path


SCRIPT_FIXTURE = "/tmp/darc_ray_fixtures/text_scripts.parquet"

_SCRIPT_PATS = {
    "latin": "[A-Za-z]",
    "cyr": "[Ѐ-ӿ]",
    "greek": "[Ͱ-Ͽ]",
    "cjk": "[一-鿿]",
    "digit": "[0-9]",
}


def ensure_script_fixture(path: str = SCRIPT_FIXTURE) -> str:
    """Deterministic mixed-script corpus for the homoglyph-spoofing
    gate (the sf documents table is ASCII): clean Latin docs; pure
    Cyrillic and pure Greek docs (legit non-Latin text that must NOT
    flag); HOMOGLYPH SPOOFS — Latin words with 1-2 Cyrillic look-alike
    substitutions (а е о с р х), the phishing/SEO-cloak tell; a
    Greek-in-Latin mixed word (μicro); CJK docs with separate-word
    Latin brand names (cross-script DOCS are fine, cross-script WORDS
    are not); digit/punct decoys.  Fixed path + atomic write + ALWAYS
    rewritten, sf-independent."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    lat = ("payment account secure login verify bank update confirm "
           "invoice shipping order status click here now").split()
    cyr_sub = {"a": "а", "e": "е", "o": "о",
               "c": "с", "p": "р", "x": "х"}
    docs = []
    for d in range(120):
        rng = np.random.default_rng(61_000 + d)
        words = list(rng.choice(lat, size=int(rng.integers(8, 20))))
        kind = d % 6
        if kind == 1:                      # pure Cyrillic (legit)
            words = ["привет",
                     "мир"] * (len(words) // 2 + 1)
        elif kind == 2:                    # homoglyph spoof: 1-2 words
            for _ in range(int(rng.integers(1, 3))):
                wi = int(rng.integers(0, len(words)))
                w = words[wi]
                subs = [i for i, ch in enumerate(w) if ch in cyr_sub]
                if subs:
                    i0 = subs[int(rng.integers(0, len(subs)))]
                    words[wi] = w[:i0] + cyr_sub[w[i0]] + w[i0 + 1:]
        elif kind == 3:                    # pure Greek (legit)
            words = ["αλφα",
                     "βητα"] * (len(words) // 2 + 1)
        elif kind == 4:                    # CJK + separate Latin brand
            words = ["中文文本"] * 3 + ["brand"]
        elif kind == 5:                    # Greek-in-Latin mixed word
            words.append("μicro")
        words.append(str(100 + d))         # digit decoy everywhere
        docs.append(" ".join(words))
    table = pa.table({
        "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
        "text": pa.array(docs)})
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)                      # atomic on POSIX
    return path


def script_mix_features(texts: pd.Series) -> pd.DataFrame:
    """Vectorized per-doc script census + within-word mixing count:
    per-script codepoint counts (single-char classes — no alternation
    semantics to diverge between `re` and RE2), and ``n_mixed_words``
    = whitespace words containing letters from ≥ 2 of
    {Latin, Cyrillic, Greek} (the homoglyph signal; cross-script
    DOCS — a CJK text with a Latin brand word — do not count).
    ``spoof`` ⇔ n_mixed_words ≥ 1."""
    idx = texts.index
    out = pd.DataFrame(index=idx)
    for name, pat in _SCRIPT_PATS.items():
        out[f"n_{name}"] = texts.str.count(pat).astype("int64")
    out["n_mixed_words"] = mixed_script_word_counts(texts)
    out["spoof"] = (out["n_mixed_words"] >= 1).astype("int64")
    return out


def mixed_script_word_counts(texts: pd.Series) -> pd.Series:
    """Per-doc count of whitespace words mixing letters of ≥ 2 of
    {Latin, Cyrillic, Greek} — the homoglyph-signal kernel shared by
    `script_mix_gate` and the intl curation capstone (one definition,
    one place for the word-split and script-class contracts)."""
    idx = texts.index
    w = texts.str.strip().str.split(r"\s+", regex=True).explode()
    w = w[w.notna() & w.ne("")]
    has = {k: w.str.contains(_SCRIPT_PATS[k], regex=True)
           for k in ("latin", "cyr", "greek")}
    mixed = ((has["latin"] & has["cyr"])
             | (has["latin"] & has["greek"])
             | (has["cyr"] & has["greek"]))
    return (mixed.groupby(level=0).sum()
            .reindex(idx, fill_value=0).astype("int64"))


NFC_FIXTURE = "/tmp/darc_ray_fixtures/text_nfc.parquet"


def ensure_nfc_fixture(path: str = NFC_FIXTURE) -> str:
    """Deterministic Unicode-normalization corpus (the sf documents
    are ASCII): composed vs DECOMPOSED canonical-equivalent pairs
    (café four ways: NFC, e+combining-acute, plus distractor spelling),
    singleton normalizations that change content WITHOUT changing
    length (Å U+212B → U+00C5 — the case a length-only `changed` test
    misses), combining sequences with NO precomposed form (x̄ = x +
    U+0304, NFC-stable), and clean ASCII.  A pipeline that hashes
    before normalizing misses every one of these dups — that is the
    gate's point.  Fixed path + atomic write + ALWAYS rewritten,
    sf-independent."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = []
    for d in range(90):
        rng = np.random.default_rng(71_000 + d)
        kind = d % 5
        base = " ".join(rng.choice(
            ["data", "corpus", "filter", "shard", "merge", "token"],
            size=int(rng.integers(4, 9))))
        if kind == 1:                  # composed form
            docs.append(base + " café crème")
        elif kind == 2:                # decomposed twin of kind 1's tail
            docs.append(base + " café crème")
        elif kind == 3:                # Å singleton (len-preserving change)
            docs.append(base + " Ångström")
        elif kind == 4:                # no-precomposed combining (stable)
            docs.append(base + " x\u0304 bar")
        else:
            docs.append(base)
    # one exact canonical-equivalent PAIR with identical base text
    docs.append("unit café")          # 90: composed
    docs.append("unit café")         # 91: decomposed → same NFC
    table = pa.table({
        "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
        "text": pa.array(docs)})
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)                      # atomic on POSIX
    return path


INTL_FIXTURE = "/tmp/darc_ray_fixtures/text_intl.parquet"


def ensure_intl_fixture(path: str = INTL_FIXTURE) -> str:
    """Deterministic INTERNATIONAL curation corpus for the composed
    capstone (NFC -> length gate -> homoglyph gate -> novelty gate):
    4 sources x 40 docs; kinds per doc_id % 8 — clean ASCII soup (0,5),
    decomposed accents that NFC must compose before any gate sees them
    (1), Cyrillic-homoglyph spoofs (2), exact-copy TEMPLATE docs — all
    FOUR templates, 5 copies each — so their 3-gram novelty is 0 (3),
    sub-5-token shorts (4), composed-accent docs (6), and the
    ORDER-PROVING kind (7): each kind-7 doc is the NFD twin of its
    kind-6 neighbor (raw bytes differ, NFC forms identical), so with
    NFC-first both halves of every pair collapse to novelty 0 →
    'template', while a gate-before-normalize pipeline would see 40
    unique docs and pass them all — the ordering invariant is a 40-doc
    disposition flip, not a vacuous claim.  Fixed path + atomic write
    + ALWAYS rewritten, sf-independent."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    vocab = ("market report signal window filter branch ledger "
             "summary digest archive council harbor meadow lantern "
             "granite orchard velvet copper").split()
    templates = [
        "subscribe to our newsletter for updates and offers today",
        "all rights reserved contact the webmaster for details",
        "click here to accept cookies and continue browsing now",
        "this page was generated automatically do not reply",
    ]
    sources = ["web", "forum", "wiki", "spam"]
    docs, srcs = [], []
    for d in range(160):
        rng = np.random.default_rng(81_000 + d)
        words = list(rng.choice(vocab, size=int(rng.integers(8, 16))))
        kind = d % 8
        if kind == 1:                      # decomposed accents, clean
            words.append("café")
            words.append("crème")
        elif kind == 2:                    # homoglyph spoof
            words.append("pаyment")   # Cyrillic а in Latin word
        elif kind == 3:                    # corpus-wide template copy
            words = templates[(d // 8) % len(templates)].split()
        elif kind == 4:                    # too short
            words = words[:int(rng.integers(1, 5))]
        elif kind == 6:                    # composed accents, clean
            words.append("café")
        elif kind == 7:                    # ORDER PROOF: NFD twin of d-1
            import unicodedata
            docs.append(unicodedata.normalize("NFD", docs[-1]))
            srcs.append(sources[d % 4])
            continue
        docs.append(" ".join(words))
        srcs.append(sources[d % 4])
    table = pa.table({
        "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
        "text": pa.array(docs),
        "source": pa.array(srcs)})
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)                      # atomic on POSIX
    return path


INVISIBLE_FIXTURE = "/tmp/darc_ray_fixtures/text_invisible.parquet"

# the six invisible/format codepoints the gate counts, each its own
# single-char class (no alternation semantics between re and RE2)
_INVISIBLE_PATS = {
    "nbsp": " ",
    "shy": "­",
    "zwsp": "​",
    "zwnj": "‌",
    "zwj": "‍",
    "bom": "﻿",
}


def ensure_invisible_fixture(path: str = INVISIBLE_FIXTURE) -> str:
    """Deterministic invisible-codepoint corpus (the sf documents are
    plain ASCII): docs seeded with NBSP word joins, soft hyphens
    inside words, zero-width spaces/joiners, and leading BOMs — the
    copy-paste and PDF-extraction residue that silently breaks
    tokenizers — plus clean docs and decoys that must NOT count
    (regular hyphens and spaces).  Completes the encoding-hygiene trio
    next to `mojibake_gate` and `entity_gate`.  Fixed path + atomic
    write + ALWAYS rewritten, sf-independent."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    vocab = ("render layout export import margin kerning glyph "
             "ligature caret spacing column gutter").split()
    docs = []
    for d in range(100):
        rng = np.random.default_rng(91_000 + d)
        words = list(rng.choice(vocab, size=int(rng.integers(8, 18))))
        kind = d % 5
        if kind == 1:                      # NBSP joins: 1-3
            for _ in range(int(rng.integers(1, 4))):
                i = int(rng.integers(0, len(words) - 1))
                words[i] = words[i] + " " + words.pop(i + 1)
        elif kind == 2:                    # soft hyphens inside words
            for _ in range(int(rng.integers(1, 4))):
                i = int(rng.integers(0, len(words)))
                w = words[i]
                words[i] = w[:len(w) // 2] + "­" + w[len(w) // 2:]
        elif kind == 3:                    # zero-width residue
            for ch in ("​", "‌", "‍")[
                    :int(rng.integers(1, 4))]:
                i = int(rng.integers(0, len(words)))
                words[i] = words[i] + ch
        elif kind == 4:                    # BOM at start
            words[0] = "﻿" + words[0]
        # decoys everywhere: a real hyphenated word and double spaces
        words.append("well-known")
        docs.append(" ".join(words))
    table = pa.table({
        "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
        "text": pa.array(docs)})
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)                      # atomic on POSIX
    return path


def invisible_features(texts: pd.Series) -> pd.DataFrame:
    """Per-doc invisible-codepoint census: one count per codepoint in
    ``_INVISIBLE_PATS`` (single-char classes), total, cleaned length
    (codepoints after deleting all six — NBSP deletion mirrors the
    house rule that the CENSUS is the product; a production cleaner
    would replace NBSP with a space), and ``flag`` ⇔ total ≥ 1."""
    out = pd.DataFrame(index=texts.index)
    total = None
    for name, ch in _INVISIBLE_PATS.items():
        c = texts.str.count(ch).astype("int64")
        out[f"n_{name}"] = c
        total = c if total is None else total + c
    out["n_invisible"] = total.astype("int64")
    out["len_raw"] = texts.str.len().astype("int64")
    out["len_clean"] = (out["len_raw"] - out["n_invisible"]).astype("int64")
    out["flag"] = (out["n_invisible"] >= 1).astype("int64")
    return out
