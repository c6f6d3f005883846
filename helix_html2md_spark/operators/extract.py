"""The extraction operator: documents(spans) -> extracted(spans, md, ...).

Spark-first design (SURVEY.md §3.4):

* admission gating (``maxHTMLSize``) runs JVM-side *before* the Python
  stage, as a native filter over ``aggregate(spans, sum(length))`` —
  Catalyst cannot push predicates through an opaque UDF, so we order it
  explicitly (reference size gate: /root/reference/src/index.js:159-166)
* skew defusal: explicit weight-class repartition — giant documents are
  round-robined across partitions deterministically (north_rule:
  "explicitly salted/repartitioned doc_id ranges")
* one ``mapInPandas`` crossing per Arrow batch runs the pure-Python
  transform (helix_html2md_spark.core) — no per-row Python
* per-row error capture into ``status``/``error`` columns instead of
  HTTP statuses (reference taxonomy: src/index.js:242-254)
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

from ..core.html2md import (
    SizeTooLargeError, TooManyImagesError, html2md, media_ref_to_info,
    resolve_url,
)
from ..core.transform import ConstraintsError
from .gate import apply_gate, gate_errors

SPAN_TYPE = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("order", IntegerType()),
    ]
)

EXTRACTED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(SPAN_TYPE)),
        StructField("md", StringType()),
        StructField("status", StringType()),
        StructField("error", StringType()),
        StructField("n_images", IntegerType()),
        StructField("n_blocks", IntegerType()),
        StructField("n_chars", IntegerType()),
    ]
)

_CONFIG_COLS = (
    "source_url", "org", "site", "media_enabled", "unspread_lists",
    "external_prefixes", "max_images", "max_image_size", "max_html_size",
    "boilerplate_fallback",
)

_DEF_RE = re.compile(r"^\[(image\d+)\]: (.*)$", re.M)
_REF_RE = re.compile(r"!\[[^\]\n]*\]\[(image\d+)\]")


def assemble_html(spans) -> str:
    """Concat of kind='html' span texts ordered by offset (FIXTURES.md §1)."""
    html_spans = sorted(
        (s for s in spans if s["kind"] == "html"), key=lambda s: s["offset"]
    )
    return "".join(s["text"] or "" for s in html_spans)


def build_media_lookup(spans, source_url):
    """media spans -> {resolved src url: media info dict}."""
    table = {}
    for s in spans:
        if s["kind"] != "media":
            continue
        src = s["text"] or ""
        info = media_ref_to_info(s["media_ref"] or "")
        table[resolve_url(src, source_url)] = info

    def lookup(resolved_url: str):
        return table.get(resolved_url)

    return lookup


def decompose_md(md: str):
    """markdown -> ordered output spans (FIXTURES.md §2).

    kind='media' for each ``![alt][imageN]`` occurrence and each
    ``[imageN]: url`` definition line; kind='text' for everything else.
    concat(text) == md.
    """
    defs = {m.group(1): m.group(2) for m in _DEF_RE.finditer(md)}
    spans = []
    pos = 0
    events = []
    for m in _REF_RE.finditer(md):
        events.append((m.start(), m.end(), defs.get(m.group(1), "")))
    for m in _DEF_RE.finditer(md):
        events.append((m.start(), m.end(), m.group(2)))
    events.sort()
    order = 0
    for start, end, ref in events:
        if start < pos:
            # a ref-pattern match NESTED inside an already-consumed
            # definition line (adversarial url text): emitting it would
            # duplicate text and move pos backwards, breaking the
            # concat(span.text) == md invariant
            continue
        if start > pos:
            spans.append(("text", md[pos:start], "", order))
            order += 1
        spans.append(("media", md[start:end], ref, order))
        order += 1
        pos = end
    if pos < len(md):
        spans.append(("text", md[pos:], "", order))
    return [
        {"kind": k, "text": t, "media_ref": r, "order": o}
        for k, t, r, o in spans
    ]


def _scalar(v):
    """NaN/None-safe scalar from a pandas row value."""
    if v is None:
        return None
    if isinstance(v, float) and v != v:  # NaN
        return None
    return v


def extract_row(html, media_spans, cfg_row) -> dict:
    """Transform one document (html pre-assembled JVM-side).

    EVERYTHING per-row — config parsing, media-lookup construction
    (which resolves URLs and can raise on malformed source_url), and
    the transform itself — sits inside the try: a hostile row must
    become an error ROW, never a task failure."""
    try:
        source_url = _scalar(cfg_row.get("source_url"))
        config = {
            "source_url": source_url,
            "org": _scalar(cfg_row.get("org")) or "owner",
            "site": _scalar(cfg_row.get("site")) or "repo",
            "media_enabled": bool(_scalar(cfg_row.get("media_enabled"))),
            "media_lookup": build_media_lookup(media_spans, source_url),
            "unspread_lists": bool(_scalar(cfg_row.get("unspread_lists"))),
            "external_prefixes": [
                p
                for p in (
                    _scalar(cfg_row.get("external_prefixes")) or ""
                ).split(",")
                if p
            ],
            "max_images": int(_scalar(cfg_row.get("max_images")) or 0) or None,
            "max_image_size": int(_scalar(cfg_row.get("max_image_size")) or 0) or None,
            "max_html_size": int(_scalar(cfg_row.get("max_html_size")) or 0) or None,
            "boilerplate_fallback": bool(
                _scalar(cfg_row.get("boilerplate_fallback"))
            ),
        }
        md = html2md(html, config)
    except (ConstraintsError, TooManyImagesError, SizeTooLargeError) as e:
        return dict(md="", status="constraint_error", error=str(e), spans=[])
    except Exception as e:  # noqa: BLE001 - parse never aborts the job
        return dict(md="", status="parse_error", error=f"{type(e).__name__}: {e}", spans=[])
    md_stripped = md.strip()
    out_spans = decompose_md(md_stripped)
    return dict(md=md_stripped, status="ok", error="", spans=out_spans)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # the transform allocates heavily (DOM/mdast trees); the trees are
    # acyclic so raise the cyclic-GC threshold to keep workers off
    # needless collection walks
    import gc

    gc.set_threshold(200_000, 50, 50)
    for pdf in batches:
        out = {
            "doc_id": [], "spans": [], "md": [], "status": [], "error": [],
            "n_images": [], "n_blocks": [], "n_chars": [],
        }
        gate_errs = gate_errors(pdf)
        for rownum, row in enumerate(pdf.itertuples(index=False)):
            d = row._asdict()
            gate_err = gate_errs[rownum]
            if gate_err is not None:
                # JVM admission gate already rejected this row (html was
                # blanked before the Arrow crossing); emit its error row
                out["doc_id"].append(d["doc_id"])
                out["spans"].append([])
                out["md"].append("")
                out["status"].append("constraint_error")
                out["error"].append(gate_err)
                out["n_images"].append(0)
                out["n_blocks"].append(0)
                out["n_chars"].append(0)
                continue
            raw_media = d["media_spans"]
            if raw_media is None:
                raw_media = []
            media = [
                s if isinstance(s, dict) else s.asDict() for s in raw_media
            ]
            res = extract_row(d["html_src"] or "", media, d)
            out["doc_id"].append(d["doc_id"])
            out["spans"].append(
                [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in res["spans"]]
            )
            out["md"].append(res["md"])
            out["status"].append(res["status"])
            out["error"].append(res["error"])
            # counts media SPANS — each ![alt][imageN] occurrence AND
            # each [imageN]: url definition line — i.e. "how much of the
            # output is media markup", NOT distinct images (that count
            # is the number of definition lines).  Pinned by the golden
            # parquet and the driver contract since round 1.
            out["n_images"].append(
                sum(1 for s in res["spans"] if s["kind"] == "media")
            )
            out["n_blocks"].append(res["md"].count("\n\n") + (1 if res["md"] else 0))
            out["n_chars"].append(len(res["md"]))
        yield pd.DataFrame(out)


def _validate_defaults(defaults: dict) -> dict:
    """Row-INVARIANT misconfiguration must fail loudly at the driver.
    extract_row's per-row try exists for hostile DATA; without this
    check a bad job default (max_images='abc', external_prefixes as a
    list) would stamp EVERY row parse_error and the job would 'succeed'
    with a fully degraded corpus.  A list of prefixes is normalized to
    the comma-joined string the per-row contract expects."""
    out = dict(defaults)
    ep = out.get("external_prefixes")
    if isinstance(ep, (list, tuple)):
        if not all(isinstance(p, str) for p in ep):
            raise TypeError("external_prefixes entries must be strings")
        out["external_prefixes"] = ",".join(ep)
    elif ep is not None and not isinstance(ep, str):
        raise TypeError(
            "external_prefixes must be a comma-joined string or a list"
        )
    for key in ("max_images", "max_image_size", "max_html_size",
                "heavy_bytes"):
        v = out.get(key)
        if v is None:
            continue
        try:
            int(v)
        except (TypeError, ValueError):
            raise ValueError(
                f"defaults[{key!r}] must be an integer, got {v!r}"
            ) from None
    return out


def prepare_for_extract(df: DataFrame, defaults: dict) -> DataFrame:
    """Attach config columns and assemble spans JVM-side.

    html = concat of kind='html' span texts ordered by offset; media
    spans ride along as a (small) separate array.  Handing Python two
    flat columns instead of the full nested array<struct> keeps the
    Arrow->pandas crossing cheap (strings stay columnar; nested structs
    materialize per-row python objects).
    """
    defaults = _validate_defaults(defaults)
    for c in _CONFIG_COLS:
        if c not in df.columns:
            df = df.withColumn(c, F.lit(defaults.get(c)))
        elif c in defaults:
            df = df.withColumn(c, F.coalesce(F.col(c), F.lit(defaults[c])))
    html_spans = F.array_sort(
        F.filter("spans", lambda s: s["kind"] == F.lit("html")),
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
        .when(a["offset"] > b["offset"], 1)
        .otherwise(0),
    )
    return (
        df.withColumn(
            "html_src",
            F.array_join(F.transform(html_spans, lambda s: s["text"]), ""),
        )
        .withColumn(
            "media_spans",
            F.filter("spans", lambda s: s["kind"] == F.lit("media")),
        )
        .drop("spans")
        .withColumn("_html_len", F.length("html_src"))
    )


def gate_oversized(df: DataFrame, defaults: dict) -> DataFrame:
    """JVM admission gate (reference: src/index.js:159-166), single-pass.

    Instead of splitting into ok/oversized branches (a Union whose two
    branches each re-scan the input and re-run span assembly), route
    oversized rows with a ``_gate_error`` status column and BLANK their
    html/media before the Arrow crossing: one scan, one assembly, and no
    oversized bytes ever reach Python.  The error text is byte-identical
    to the Python tier's ``f"html source larger than {mb:.0f}MB"``
    (bround = half-even, no thousands grouping).
    """
    max_html_default = int(defaults.get("max_html_size") or 1024 * 1024)
    # <= 0 means "unset" on the Python tier (`or`-chains; a negative
    # would otherwise reject everything with a '-0MB' message there);
    # coalesce alone would keep a literal 0 and reject EVERY non-empty
    # document with a '...larger than 0MB' error.  The RESOLVED limit
    # is written back into max_html_size so the Python re-check reads
    # the SAME value the gate enforced — without the write-back, a
    # row-level 0 with a job default other than 1MB resolves to the
    # job default here but to the library's 1MB in extract_row,
    # and the two tiers disagree about admission.
    df = df.withColumn(
        "max_html_size",
        F.when(
            F.col("max_html_size").isNull() | (F.col("max_html_size") <= 0),
            F.lit(max_html_default),
        )
        .otherwise(F.col("max_html_size"))
        .cast("long"),
    )
    limit = F.col("max_html_size")
    mb_str = (
        F.bround(limit / F.lit(1024 * 1024), 0)
        .cast("decimal(20,0)")
        .cast("string")
    )
    err = F.concat(
        F.lit("html source larger than "), mb_str, F.lit("MB")
    )
    return apply_gate(
        df,
        [(F.col("_html_len") > limit, err)],
        {
            "html_src": F.lit(""),
            "media_spans": F.filter("media_spans", lambda s: F.lit(False)),
        },
    )


def extract_documents(
    docs: DataFrame,
    config: DataFrame | None = None,
    *,
    num_partitions: int | None = None,
    defaults: dict | None = None,
) -> DataFrame:
    """documents(doc_id, spans[]) [+ per-doc config] -> extracted table.

    ``config`` is a small per-doc-config DataFrame broadcast-joined on
    doc_id; job-level ``defaults`` fill missing values.
    """
    spark = docs.sparkSession
    defaults = defaults or {}

    df = docs.select("doc_id", "spans")
    if config is not None:
        df = df.join(F.broadcast(config), "doc_id", "left")

    # ---- assembly + admission gate (before any Python;
    # src/index.js:159-166): ONE scan, ONE assembly — oversized rows are
    # routed via a status column with html blanked, not a Union of
    # re-scanning branches
    df = prepare_for_extract(df, defaults)
    ok = gate_oversized(df, defaults)

    # ---- explicit skew defusal ------------------------------------------
    # The transform is a pure map: partitioning only matters for byte
    # balance.  Modes:
    #   none     - input already byte-balanced (parquet/iceberg splits
    #              sized by maxPartitionBytes at scale): zero shuffle.
    #   hash     - (default) one shuffle on doc_id; statistically
    #              balanced when docs/partition is large (law of large
    #              numbers) -- the right default at corpus scale.
    #   weighted - one extra bucketed-window pass assigns
    #              weight-class round-robin placement; measured max/mean
    #              partition-weight: hash 1.89 vs weighted 1.25 on the
    #              Zipf corpus.  Task count stays == n: mapInPandas waves
    #              beyond the python worker pool thrash (identity pass
    #              1.1s @32 tasks vs 7.3s @128 tasks on local[32]).
    n = num_partitions or spark.sparkContext.defaultParallelism
    heavy_bytes = int(defaults.get("heavy_bytes") or 64 * 1024)
    mode = defaults.get("repartition") or "hash"
    if mode == "none":
        balanced = ok
    elif mode == "hash":
        balanced = ok.repartition(n, "doc_id")
    elif mode == "weighted":
        from pyspark.sql import Window

        nbuckets = max(64, n // 4)
        wclass = F.floor(
            F.log2(F.greatest(F.col("_html_len"), F.lit(1)))
        ).cast("int")
        bucket = F.when(
            F.col("_html_len") < heavy_bytes,
            F.pmod(F.xxhash64("doc_id"), F.lit(nbuckets)),
        ).otherwise(F.lit(0))
        ok2 = ok.withColumn("_wc", wclass).withColumn("_b", bucket)
        w = Window.partitionBy("_wc", "_b").orderBy("doc_id")
        place = F.pmod(
            F.xxhash64(F.col("_wc"), F.col("_b")) + F.row_number().over(w),
            F.lit(n),
        )
        # repartitionByRange, NOT repartition: hash partitioning would
        # route the n computed place values through murmur3 (birthday
        # collisions — ~1/e of partitions get no heavy doc while others
        # get several), while range partitioning over place in [0, n)
        # with n partitions APPROXIMATES one place value per partition,
        # preserving the round-robin the window computed.  Two costs to
        # be honest about: the range exchange runs a hidden SAMPLING
        # job that re-executes the post-window projection to sketch
        # boundaries, and reservoir sampling can merge two sparse
        # adjacent place values (the 1.25 max/mean figure is empirical
        # on the Zipf corpus, not structural).
        balanced = (
            ok2.withColumn("_place", place)
            .repartitionByRange(n, "_place")
            .drop("_wc", "_b", "_place")
        )
    else:
        raise ValueError(
            f"unknown repartition mode {mode!r}"
            " (expected 'none', 'hash', or 'weighted')"
        )

    return balanced.drop("_html_len").mapInPandas(
        _extract_batches, schema=EXTRACTED_SCHEMA
    )
