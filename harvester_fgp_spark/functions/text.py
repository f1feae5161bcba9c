"""Deterministic text extraction + geo mining kernels (SURVEY.md §2.3).

``extract_text`` is the single source of truth for the byte-identity
invariant (BASELINE.json:15 "byte-identical extracted text per url"):
the Spark pandas-UDF path (operators.extract) and the plain-Python pytest
oracle both call THIS function, and tests assert byte equality per url
(SURVEY §5.2-1). Re-expresses the reference's record normalization
([REF? harvest_hnap.py] — XML XPath extraction) for HTML pages; keep it
dependency-free (stdlib html parsing only) and strictly deterministic.
"""

from __future__ import annotations

import hashlib
import re
import unicodedata
from html.parser import HTMLParser

_WS_RE = re.compile(r"\s+")

# Tags whose content is never page text.
_SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})
# Tags that imply a word boundary when entered/exited.
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "br", "li", "ul", "ol", "tr", "td", "th", "table",
        "h1", "h2", "h3", "h4", "h5", "h6", "section", "article",
        "header", "footer", "blockquote", "pre", "title", "body",
    }
)


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        if tag in _BLOCK_TAGS:
            self.chunks.append(" ")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag in _BLOCK_TAGS:
            self.chunks.append(" ")

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            self.chunks.append(data)


def extract_text(html: bytes | None) -> str | None:
    """html bytes -> canonical extracted text (E1).

    Deterministic pipeline: UTF-8 decode (replacement on bad bytes) ->
    tag-strip with script/style suppression -> NFC unicode normalization
    -> whitespace canonicalization (any run -> single space, strip).
    """
    if html is None:
        return None
    raw = html.decode("utf-8", errors="replace")
    parser = _TextExtractor()
    try:
        parser.feed(raw)
        parser.close()
    except Exception:
        # Malformed markup: fall back to a regex tag strip — still
        # deterministic, still the same on both oracle and UDF paths.
        stripped = re.sub(r"<[^>]*>", " ", raw)
        return _WS_RE.sub(" ", unicodedata.normalize("NFC", stripped)).strip()
    text = "".join(parser.chunks)
    return _WS_RE.sub(" ", unicodedata.normalize("NFC", text)).strip()


# --- E2: geo-payload mining ------------------------------------------------
# Decimal coordinate pair: "45.4215, -75.6972" (lat, lon).
COORD_PAIR_RE = re.compile(
    r"(?<![\d.-])(-?(?:90(?:\.0+)?|[0-8]?\d(?:\.\d+)?))\s*,\s*"
    r"(-?(?:180(?:\.0+)?|1[0-7]\d(?:\.\d+)?|\d?\d(?:\.\d+)?))(?![\d.])"
)
# Bbox phrase: "west: -141.00 east: -52.00 south: 42.00 north: 70.00".
BBOX_RE = re.compile(
    r"west:\s*(-?\d+(?:\.\d+)?)\s+east:\s*(-?\d+(?:\.\d+)?)\s+"
    r"south:\s*(-?\d+(?:\.\d+)?)\s+north:\s*(-?\d+(?:\.\d+)?)",
    re.IGNORECASE,
)
# Cheap native pre-filter (P5): pushed down BEFORE the UDF miner so the
# Arrow boundary only sees plausible rows. Keep in sync with the two
# patterns above.
COORD_PREFILTER_RE = r"(-?\d+\.\d+\s*,\s*-?\d+\.\d+)|(?i)west:\s*-?\d"


def mine_payloads_batch(texts) -> list[list[dict]]:
    """Batched E2 miner over a pandas Series — the pandas-UDF hot path.

    Semantics identical to ``mine_payloads`` (property-tested in
    tests/test_text_kernels.py::test_batch_miner_equals_scalar): bboxes
    first in match order, then points in match order, same range checks.
    extractall amortizes the per-row call/dict overhead; bbox spans are
    masked (length-preserving) before point extraction, but only on the
    minority of rows that contain a bbox — e.g. "north: 4, 5.5" must not
    leak the bbox's trailing number into a point pair.
    """
    t = texts.reset_index(drop=True).fillna("")
    out: list[list[dict]] = [[] for _ in range(len(t))]
    bb = t.str.extractall(BBOX_RE)
    bb_rows: set[int] = set()
    if len(bb):
        rows = bb.index.get_level_values(0).to_numpy()
        bb_rows = set(rows.tolist())
        w = bb[0].astype(float).to_numpy()
        e = bb[1].astype(float).to_numpy()
        s = bb[2].astype(float).to_numpy()
        n = bb[3].astype(float).to_numpy()
        # west > east is LEGAL (ISO 19115 bbox crossing the antimeridian,
        # e.g. Fiji/Alaska pages) — only range violations are dropped
        ok = (
            (-180.0 <= w) & (w <= 180.0) & (-180.0 <= e) & (e <= 180.0)
            & (s <= n) & (-90.0 <= s) & (n <= 90.0)
        )
        for r, wv, sv, ev, nv in zip(rows[ok], w[ok], s[ok], e[ok], n[ok]):
            out[r].append(
                {"kind": "bbox", "lat": None, "lon": None,
                 "west": wv, "south": sv, "east": ev, "north": nv}
            )
    if bb_rows:
        t = t.copy()
        for r in bb_rows:
            t.iat[r] = BBOX_RE.sub(lambda m: " " * len(m.group(0)), t.iat[r])
    pts = t.str.extractall(COORD_PAIR_RE)
    if len(pts):
        rows = pts.index.get_level_values(0).to_numpy()
        lat = pts[0].astype(float).to_numpy()
        lon = pts[1].astype(float).to_numpy()
        ok = (-90.0 <= lat) & (lat <= 90.0) & (-180.0 <= lon) & (lon <= 180.0)
        for r, la, lo in zip(rows[ok], lat[ok], lon[ok]):
            out[r].append(
                {"kind": "point", "lat": la, "lon": lo,
                 "west": None, "south": None, "east": None, "north": None}
            )
    return out


def mine_payloads_flat(texts):
    """Fully-vectorized E2 miner: pandas Series -> flat numpy arrays
    ``(row_idx, payload_idx, kind, lat, lon, west, south, east, north)``.

    Same semantics as ``mine_payloads`` per row (bboxes first in match
    order, then points in match order, same range checks, bbox spans
    masked before point extraction) but with ZERO per-row Python: both
    regex passes are ``Series.str.extractall`` (C loop), ordering is one
    lexsort, and payload ordinals come from unique-offset arithmetic.
    NaN in the float arrays means "missing" (regexes never produce NaN).
    Property-tested equal to the scalar kernel in tests/test_text_kernels.
    """
    import numpy as np

    t = texts.reset_index(drop=True).fillna("")

    bb = t.str.extractall(BBOX_RE)
    if len(bb):
        rows = bb.index.get_level_values(0).to_numpy()
        w = bb[0].astype(float).to_numpy()
        e = bb[1].astype(float).to_numpy()
        s = bb[2].astype(float).to_numpy()
        n = bb[3].astype(float).to_numpy()
        # west > east allowed: antimeridian-crossing bbox (ISO 19115)
        ok = (
            (-180.0 <= w) & (w <= 180.0) & (-180.0 <= e) & (e <= 180.0)
            & (s <= n) & (-90.0 <= s) & (n <= 90.0)
        )
        b_rows, bw, bs, be, bn = rows[ok], w[ok], s[ok], e[ok], n[ok]
        # mask EVERY matched span (valid or not), exactly like the scalar
        # kernel, so bbox numbers are never re-mined as point pairs
        mask_rows = np.unique(rows)
        t = t.copy()
        t.iloc[mask_rows] = t.iloc[mask_rows].str.replace(
            BBOX_RE, lambda m: " " * len(m.group(0)), regex=True
        )
    else:
        b_rows = np.empty(0, dtype=np.int64)
        bw = bs = be = bn = np.empty(0, dtype=np.float64)

    # COORD_PAIR_RE requires a literal comma, so scanning comma-free rows
    # is pure waste (~35% of prefiltered rows are bbox-only) — and bbox
    # masking never removes a comma (matched spans contain none), so the
    # subset is exact, not heuristic. t has a RangeIndex, so extractall's
    # level-0 labels on the subset are already original row numbers.
    with_comma = t[t.str.contains(",", regex=False)]
    pts = with_comma.str.extractall(COORD_PAIR_RE)
    if len(pts):
        rows = pts.index.get_level_values(0).to_numpy()
        plat = pts[0].astype(float).to_numpy()
        plon = pts[1].astype(float).to_numpy()
        ok = (-90.0 <= plat) & (plat <= 90.0) & (-180.0 <= plon) & (plon <= 180.0)
        p_rows, plat, plon = rows[ok], plat[ok], plon[ok]
    else:
        p_rows = np.empty(0, dtype=np.int64)
        plat = plon = np.empty(0, dtype=np.float64)

    nb, npt = len(b_rows), len(p_rows)
    rows_all = np.concatenate([b_rows, p_rows]).astype(np.int64)
    rank = np.concatenate(
        [np.zeros(nb, dtype=np.int8), np.ones(npt, dtype=np.int8)]
    )
    # (row, bbox-before-point, original match order) — arange keeps the
    # within-group extractall order under lexsort
    order = np.lexsort((np.arange(nb + npt), rank, rows_all))
    rows_o = rows_all[order]
    kind = np.where(rank[order] == 0, "bbox", "point")
    nanb = np.full(nb, np.nan)
    nanp = np.full(npt, np.nan)
    lat = np.concatenate([nanb, plat])[order]
    lon = np.concatenate([nanb, plon])[order]
    west = np.concatenate([bw, nanp])[order]
    south = np.concatenate([bs, nanp])[order]
    east = np.concatenate([be, nanp])[order]
    north = np.concatenate([bn, nanp])[order]

    if len(rows_o):
        _, first_idx, counts = np.unique(
            rows_o, return_index=True, return_counts=True
        )
        pidx = np.arange(len(rows_o)) - np.repeat(first_idx, counts)
    else:
        pidx = np.empty(0, dtype=np.int64)
    return rows_o, pidx, kind, lat, lon, west, south, east, north


def mine_payloads(text: str | None) -> list[dict]:
    """Text -> list of geo-payload dicts (kind/lat/lon/west/south/east/north).

    Re-expresses the reference's EX_GeographicBoundingBox extraction
    ([REF? harvest_hnap.py]; corroborated by BASELINE.json:6 "bounding
    boxes and point coordinates mined from metadata-like records").
    Bboxes are mined first and their spans masked so a bbox's numbers are
    not re-mined as bogus point pairs.
    """
    if not text:
        return []
    out: list[dict] = []
    masked = text
    for m in BBOX_RE.finditer(text):
        w, e, s, n = (float(m.group(i)) for i in (1, 2, 3, 4))
        # west > east allowed: antimeridian-crossing bbox (ISO 19115)
        if (
            -180.0 <= w <= 180.0
            and -180.0 <= e <= 180.0
            and -90.0 <= s <= n <= 90.0
        ):
            out.append(
                {
                    "kind": "bbox",
                    "lat": None,
                    "lon": None,
                    "west": w,
                    "south": s,
                    "east": e,
                    "north": n,
                }
            )
        masked = masked.replace(m.group(0), " " * len(m.group(0)), 1)
    for m in COORD_PAIR_RE.finditer(masked):
        lat, lon = float(m.group(1)), float(m.group(2))
        if -90.0 <= lat <= 90.0 and -180.0 <= lon <= 180.0:
            out.append(
                {
                    "kind": "point",
                    "lat": lat,
                    "lon": lon,
                    "west": None,
                    "south": None,
                    "east": None,
                    "north": None,
                }
            )
    return out


# --- Text analysis (training-data ops) --------------------------------------

_STOPWORDS = {
    "en": frozenset(
        "the of and to in a is that it was for on are as with his they at be "
        "this have from or had by not word but what some we can out other were "
        "all there when up use your how said an each she".split()
    ),
    "fr": frozenset(
        "le la les de des du un une et en est que qui dans pour sur avec ne pas "
        "ce cette ces il elle ils elles nous vous au aux par plus mais ou si "
        "son sa ses leur dont être avoir fait comme tout".split()
    ),
    "es": frozenset(
        "el la los las de del un una y en es que se no por con para su al lo "
        "como más pero sus le ya o este sí porque esta entre cuando muy sin".split()
    ),
    "de": frozenset(
        "der die das und in den von zu mit sich des auf für ist im dem nicht "
        "ein eine als auch es an werden aus er hat dass sie nach wird bei".split()
    ),
}

_TOKEN_RE = re.compile(r"[a-zA-ZÀ-ɏ]+|\d+|[^\sa-zA-Z\d]")
_WORD_RE = re.compile(r"[a-zA-ZÀ-ɏ]+")
_PUNCT_RE = re.compile(r"[^\w\s]")


def detect_lang(text: str | None) -> str:
    """N-gram/stopword-heuristic language id -> 'en'|'fr'|'es'|'de'|'und'."""
    if not text:
        return "und"
    words = _WORD_RE.findall(text.lower())[:500]
    if not words:
        return "und"
    best, best_hits = "und", 0
    for lang, sw in _STOPWORDS.items():
        hits = sum(1 for w in words if w in sw)
        if hits > best_hits:
            best, best_hits = lang, hits
    return best if best_hits >= max(2, len(words) // 50) else "und"


def quality_score(text: str | None) -> float:
    """Heuristic [0,1] quality: length, word ratio, punct ratio, stopwords."""
    if not text:
        return 0.0
    n = len(text)
    words = _WORD_RE.findall(text.lower())
    if not words:
        return 0.0
    len_score = min(1.0, n / 1000.0)
    mean_wl = sum(map(len, words)) / len(words)
    wl_score = 1.0 if 3.0 <= mean_wl <= 10.0 else 0.5
    punct_ratio = len(_PUNCT_RE.findall(text)) / n
    punct_score = 1.0 if punct_ratio < 0.1 else max(0.0, 1.0 - punct_ratio)
    sw = _STOPWORDS["en"] | _STOPWORDS["fr"]
    sw_ratio = sum(1 for w in words if w in sw) / len(words)
    sw_score = min(1.0, sw_ratio * 4.0)
    return round((len_score + wl_score + punct_score + sw_score) / 4.0, 6)


def detect_lang_batch(texts):
    """Vectorized twin of ``detect_lang`` over a pandas Series.

    Same semantics, property-tested equal per row (test_textops_native);
    stopword membership is ``np.isin`` over the flattened word array with
    bincount re-aggregation; the argmax preserves the scalar kernel's tie
    order (en, fr, es, de — first max wins).

    MEASURED SLOWER than the scalar kernel (0.62s vs 0.083s / 5000
    driver docs): findall dominates both paths and the object-array
    explode + isin costs more than per-row set probing saves. Kept as
    the property-tested reference; production uses the fused scalar
    ``lang_quality`` (operators.textops.lang_quality_udf).
    """
    import numpy as np
    import pandas as pd

    t = texts.reset_index(drop=True).fillna("")
    w500 = t.str.lower().str.findall(_WORD_RE).str[:500]
    n = len(t)
    nw = w500.str.len().to_numpy(dtype=np.int64)
    flat = w500.explode()
    mask = flat.notna().to_numpy()
    vals = flat.to_numpy(dtype=object)[mask]
    row_idx = flat.index.to_numpy(dtype=np.int64)[mask]
    order = ("en", "fr", "es", "de")
    hits = np.zeros((len(order), n), dtype=np.int64)
    for i, lang in enumerate(order):
        sw = np.array(sorted(_STOPWORDS[lang]), dtype=object)
        member = np.isin(vals, sw)
        hits[i] = np.bincount(row_idx[member], minlength=n)
    best_idx = hits.argmax(axis=0)  # first max in dict order == scalar kernel
    best_hits = hits.max(axis=0)
    thresh = np.maximum(2, nw // 50)
    langs = np.array(order, dtype=object)[best_idx]
    out = np.where((nw == 0) | (best_hits < thresh), "und", langs)
    return pd.Series(out, dtype=object)


def quality_score_batch(texts):
    """Vectorized twin of ``quality_score``: identical IEEE op order per
    row (left-associative component sum, single divisions), so outputs are
    bit-identical to the scalar kernel — only the regex scans and stopword
    membership are hoisted to whole-batch operations. The final round(x, 6)
    stays Python's correctly-rounded round (np.round's scale-rint-unscale
    can differ at ulp boundaries); it is O(rows) trivial arithmetic, not a
    per-row kernel.

    MEASURED SLOWER than the scalar kernel (same story as
    ``detect_lang_batch`` — see its docstring); production uses the fused
    scalar ``lang_quality``."""
    import numpy as np
    import pandas as pd

    t = texts.reset_index(drop=True).fillna("")
    n = t.str.len().to_numpy(dtype=np.int64)
    words = t.str.lower().str.findall(_WORD_RE)
    nw = words.str.len().to_numpy(dtype=np.int64)
    flat = words.explode()
    mask = flat.notna().to_numpy()
    flat_w = flat[flat.notna()]
    row_idx = flat.index.to_numpy(dtype=np.int64)[mask]
    wlens = flat_w.str.len().to_numpy(dtype=np.int64)
    rows = len(t)
    # integer char sums are exact in float64 far beyond any document size
    sum_wlen = np.bincount(row_idx, weights=wlens, minlength=rows)
    sw = np.array(sorted(_STOPWORDS["en"] | _STOPWORDS["fr"]), dtype=object)
    member = np.isin(flat_w.to_numpy(dtype=object), sw)
    sw_hits = np.bincount(row_idx[member], minlength=rows)
    n_punct = t.str.count(_PUNCT_RE).to_numpy(dtype=np.int64)

    nw_safe = np.where(nw == 0, 1, nw)
    n_safe = np.where(n == 0, 1, n)
    mean_wl = sum_wlen / nw_safe
    punct_ratio = n_punct / n_safe
    sw_ratio = sw_hits / nw_safe

    len_score = np.minimum(1.0, n / 1000.0)
    wl_score = np.where((mean_wl >= 3.0) & (mean_wl <= 10.0), 1.0, 0.5)
    punct_score = np.where(
        punct_ratio < 0.1, 1.0, np.maximum(0.0, 1.0 - punct_ratio)
    )
    sw_score = np.minimum(1.0, sw_ratio * 4.0)
    q = (len_score + wl_score + punct_score + sw_score) / 4.0
    out = [
        0.0 if nw[i] == 0 else round(float(q[i]), 6) for i in range(rows)
    ]
    return pd.Series(out, dtype=np.float64)


def lang_quality(text: str | None) -> tuple[str, float]:
    """Fused detect_lang + quality_score: ONE lower()+findall pass feeds
    both outputs (they are separately the dominant cost of each kernel —
    measured 0.073s of 0.083s per 5000 driver docs). Output is
    definitionally identical to calling the two canonical kernels
    (property-tested per row in test_textops_native)."""
    if not text:
        return "und", 0.0
    words = _WORD_RE.findall(text.lower())
    if not words:
        return "und", 0.0
    w500 = words[:500]
    best, best_hits = "und", 0
    for lang, sw in _STOPWORDS.items():
        hits = sum(1 for w in w500 if w in sw)
        if hits > best_hits:
            best, best_hits = lang, hits
    detected = best if best_hits >= max(2, len(w500) // 50) else "und"

    n = len(text)
    len_score = min(1.0, n / 1000.0)
    mean_wl = sum(map(len, words)) / len(words)
    wl_score = 1.0 if 3.0 <= mean_wl <= 10.0 else 0.5
    punct_ratio = len(_PUNCT_RE.findall(text)) / n
    punct_score = 1.0 if punct_ratio < 0.1 else max(0.0, 1.0 - punct_ratio)
    swu = _STOPWORDS["en"] | _STOPWORDS["fr"]
    sw_ratio = sum(1 for w in words if w in swu) / len(words)
    sw_score = min(1.0, sw_ratio * 4.0)
    quality = round((len_score + wl_score + punct_score + sw_score) / 4.0, 6)
    return detected, quality


def token_count(text: str | None) -> int:
    """BPE-ish regex token count (words / digit runs / punct singletons).

    The production path is NATIVE (operators.textops.token_count_col:
    size(regexp_extract_all) in whole-stage codegen); this scalar kernel
    is the pytest oracle for it."""
    if not text:
        return 0
    return len(_TOKEN_RE.findall(text))


def fingerprint64(text: str | None) -> int:
    """Stable 63-bit document fingerprint (sha1-based rolling hash)."""
    if text is None:
        return 0
    h = hashlib.sha1(text.encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big") & ((1 << 63) - 1)


def shingles(text: str, k: int = 5) -> set[int]:
    """Word k-shingles -> 63-bit hash set (MinHash/Jaccard input)."""
    words = text.lower().split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return {
        int.from_bytes(hashlib.sha1(g.encode()).digest()[:8], "big") & ((1 << 63) - 1)
        for g in grams
    }
