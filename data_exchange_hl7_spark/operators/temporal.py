"""Temporal CDC operators: SCD2 history, two-table as-of join, changelog
normalization, and net-change folding — the dimension-maintenance half of a
CDC engine, Spark-first.

The reference pipeline materializes only the *latest* state per case
(latest_flag_and_sequencing.scala:49-151) and its nearest-preceding anchor
semantics live inside the HL7 transform (fn_hl7_to_obxs_and_segm.scala:26-34).
A lakehouse consumer of the same change feed additionally needs:

- ``scd2``             — every version with a validity interval (Kimball
                         slowly-changing-dimension type 2), derived from the
                         ordered feed with ONE window (lead), no self-join;
- ``asof_join``        — facts joined to the dimension state *as of* each
                         fact's LSN.  Implemented as the union/sort-merge
                         as-of: tag both sides, one window per key carries
                         the last dimension image forward, filter back to
                         facts.  One shuffle, no range explosion, no
                         per-fact probe join;
- ``changelog_normalize`` — an upsert/delete keyed feed re-emitted as an
                         insert-only retraction stream (+I / -U / +U / -D),
                         the changelog contract downstream incremental
                         aggregates consume (Flink's ChangelogNormalize is
                         the public analogue); lag window + explode, one
                         shuffle;
- ``net_changes``      — fold a feed window down to at most one net change
                         per key given the pre-window state (Delta CDF
                         "net changes" semantics): one mergeable max-struct
                         aggregation, no window function at all;
- ``edit_pairs``       — consecutive (before, after) content transitions per
                         key from the ordered feed (CommitPack-style code-
                         edit training pairs): one lag window classifies
                         create/modify/delete and scores each modify with a
                         capped-prefix Levenshtein.

Scale notes (100 TB): every operator here is a single hash exchange on the
key (or a pure aggregation with map-side combine for ``net_changes``); the
as-of join never builds a range product — the union trick keeps cost
O(|facts| + |dim|) through one sort within key partitions. Hot keys follow
the same salting story as operators/dedup.py (the window variants) — the
aggregation variant (``net_changes``) is skew-immune by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    ts_col: str,
    delete_predicate: F.Column | None = None,
) -> DataFrame:
    """SCD Type-2 versioning: each non-delete event opens a version valid
    from its own ``ts_col`` until the next event's (NULL while current).

    Delete events close the preceding version without opening one, so a key
    whose last event is a delete has no current version. Output adds
    ``valid_from`` / ``valid_to`` (same type as ``ts_col``), ``version_no``
    (1-based over surviving versions) and ``is_current``.

    One window (lead) over one key exchange; the version filter runs after
    the lead so deletes still close intervals.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    out = (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    if delete_predicate is not None:
        # NULL-predicate rows are NOT deletes (matching changelog_normalize /
        # net_changes, where a NULL falls through to the upsert branch) —
        # a bare ~NULL filter would silently drop the version instead
        out = out.filter(~F.coalesce(delete_predicate, F.lit(False)))
    return out.withColumn("version_no", F.row_number().over(w))


def asof_join(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    lsn_col: str,
    dim_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Join each fact row to the dimension row with the greatest
    ``lsn_col`` <= the fact's ``lsn_col`` for the same key (point-in-time /
    as-of join; DuckDB's ASOF JOIN is the single-node oracle analogue).

    Union both sides with a side tag, carry the last dimension image
    forward with one last(ignorenulls) window per key, keep fact rows.
    ``lsn_col`` must be unique within key across both sides (a true LSN);
    fact columns pass through, dimension columns arrive as
    ``{prefix}{col}`` (NULL when no dimension row precedes the fact).
    """
    fact_cols = facts.columns
    clash = [c for c in dim_cols if prefix + c in fact_cols]
    if clash:
        # withColumn would silently OVERWRITE the fact column and the final
        # select would name it twice — refuse instead
        raise ValueError(
            f"facts already carries column(s) {[prefix + c for c in clash]}; "
            f"pass a different prefix="
        )
    d = dim.select(
        *key_cols,
        F.col(lsn_col),
        F.struct(*[F.col(c) for c in dim_cols]).alias("__dim_img"),
    ).withColumn("__side", F.lit(0))
    f = facts.withColumn("__dim_img", F.lit(None).cast(d.schema["__dim_img"].dataType))
    f = f.withColumn("__side", F.lit(1))
    u = f.select(
        *fact_cols, "__dim_img", "__side"
    ).unionByName(
        d.select(
            *key_cols,
            F.col(lsn_col),
            *[F.lit(None).cast(facts.schema[c].dataType).alias(c)
              for c in fact_cols if c not in (*key_cols, lsn_col)],
            "__dim_img",
            "__side",
        )
    )
    # dim rows sort before a fact at the same LSN (cannot happen with a true
    # LSN, but keeps the contract total)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(lsn_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__dim_img", ignorenulls=True).over(w)
    out = u.withColumn("__carried", carried).filter(F.col("__side") == 1)
    for c in dim_cols:
        out = out.withColumn(prefix + c, F.col("__carried")[c])
    return out.select(*fact_cols, *[prefix + c for c in dim_cols])


def changelog_normalize(
    df: DataFrame,
    key_cols: list[str],
    lsn_col: str,
    image_cols: list[str],
    delete_predicate: F.Column,
) -> DataFrame:
    """Re-emit a keyed upsert/delete feed as an insert-only retraction
    changelog: +I (first state), -U/+U (state replaced: before image then
    after image), -D (state deleted; before image). A delete arriving while
    no state exists emits nothing.

    Output: key columns, ``lsn`` (the driving event's LSN), ``change_op``,
    ``step`` (0 = retract, 1 = add — the deterministic within-LSN order),
    and the image columns. One lag window + explode; each input row expands
    to at most 2 output rows.
    """
    img = F.struct(F.col(lsn_col).alias("__lsn"), *[F.col(c) for c in image_cols])
    w = Window.partitionBy(*key_cols).orderBy(lsn_col)
    d = (
        df.withColumn("__img", img)
        .withColumn("__is_del", delete_predicate)
        .withColumn("__prev", F.lag("__img").over(w))
        .withColumn("__prev_del", F.lag(delete_predicate).over(w))
    )
    present = F.col("__prev").isNotNull() & ~F.col("__prev_del")

    def _row(op: str, step: int, image: F.Column) -> F.Column:
        return F.struct(
            F.lit(op).alias("change_op"),
            F.lit(step).cast("int").alias("step"),
            image.alias("img"),
        )

    # delete-of-absent emits nothing: an empty array of the SAME struct type
    # (slice of a populated array — a bare F.array() has no element type)
    rows = (
        F.when(F.col("__is_del") & present, F.array(_row("-D", 0, F.col("__prev"))))
        .when(F.col("__is_del"), F.slice(F.array(_row("-D", 0, F.col("__prev"))), 1, 0))
        .when(
            present,
            F.array(_row("-U", 0, F.col("__prev")), _row("+U", 1, F.col("__img"))),
        )
        .otherwise(F.array(_row("+I", 1, F.col("__img"))))
    )
    ex = d.select(
        *key_cols, F.col(lsn_col).alias("lsn"), F.explode(rows).alias("__c")
    )
    return ex.select(
        *key_cols,
        "lsn",
        F.col("__c.change_op").alias("change_op"),
        F.col("__c.step").alias("step"),
        F.col("__c.img.__lsn").alias("img_lsn"),
        *[F.col(f"__c.img.{c}").alias(f"img_{c}") for c in image_cols],
    )


def edit_pairs(
    df: DataFrame,
    key_cols: list[str],
    lsn_col: str,
    content_col: str,
    delete_predicate: F.Column | None = None,
    distance_prefix: int = 200,
) -> DataFrame:
    """Consecutive (before, after) content transitions per key from an
    ordered version feed — the extractor behind code-edit training sets
    (CommitPack-style (old file, new file) pairs mined from VCS history;
    the reference's feed carries exactly this shape: repo/path keyed
    content versions, latest_flag_and_sequencing.scala:49-151 keeps only
    the last one, this keeps every transition).

    Output per input version: the key columns, ``from_lsn``/``to_lsn``
    (before/after version LSNs; ``from_lsn`` NULL for a create),
    ``edit_kind`` ('create' | 'modify' | 'delete'), ``before_content`` /
    ``after_content``, byte lengths, ``is_noop`` (content byte-identical —
    a metadata-only change a pair miner drops), and ``edit_distance``
    (Levenshtein over the first ``distance_prefix`` chars — the cheap
    locality proxy pair miners threshold on; full-text distance is
    O(len²) per pair and belongs behind an explicit opt-in, the same
    honesty contract as neardup_editdist_verify's capped verify).

    A delete row closes the key: kind 'delete', after side NULL. A version
    arriving after a delete is a fresh 'create' (the prior image is gone).

    Scale shape: ONE lag window over one hash exchange on the key — the
    same exchange family as A1 latest-flag dedup; every row in produces
    exactly one row out, and the distance column is a narrow projection
    (JVM Levenshtein on bounded prefixes, no Python).
    """
    is_del = (
        delete_predicate if delete_predicate is not None else F.lit(False)
    )
    w = Window.partitionBy(*key_cols).orderBy(lsn_col)
    d = (
        df.withColumn("__is_del", is_del)
        .withColumn("__prev_lsn", F.lag(lsn_col).over(w))
        .withColumn("__prev_content", F.lag(content_col).over(w))
        .withColumn("__prev_del", F.lag(is_del).over(w))
    )
    present = F.col("__prev_lsn").isNotNull() & ~F.col("__prev_del")
    before = F.when(present, F.col("__prev_content"))
    after = F.when(~F.col("__is_del"), F.col(content_col))
    kind = (
        F.when(F.col("__is_del") & present, F.lit("delete"))
        .when(F.col("__is_del"), F.lit(None).cast("string"))  # delete-of-absent
        .when(present, F.lit("modify"))
        .otherwise(F.lit("create"))
    )
    out = (
        d.withColumn("edit_kind", kind)
        .filter(F.col("edit_kind").isNotNull())
        .withColumn("from_lsn", F.when(present, F.col("__prev_lsn")))
        .withColumn("before_content", before)
        .withColumn("after_content", after)
    )
    return out.select(
        *key_cols,
        "from_lsn",
        F.col(lsn_col).alias("to_lsn"),
        "edit_kind",
        "before_content",
        "after_content",
        F.octet_length("before_content").alias("len_before"),
        F.octet_length("after_content").alias("len_after"),
        (
            F.col("before_content").isNotNull()
            & F.col("after_content").isNotNull()
            & (F.col("before_content") == F.col("after_content"))
        ).alias("is_noop"),
        F.when(
            F.col("before_content").isNotNull()
            & F.col("after_content").isNotNull(),
            F.levenshtein(
                F.substring("before_content", 1, distance_prefix),
                F.substring("after_content", 1, distance_prefix),
            ),
        ).alias("edit_distance"),
    )


def net_changes(
    df: DataFrame,
    key_cols: list[str],
    lsn_col: str,
    image_cols: list[str],
    delete_predicate: F.Column,
    split_lsn: F.Column,
) -> DataFrame:
    """Fold the feed window at/after ``split_lsn`` to at most ONE net change
    per key, classified against the pre-window state (Delta CDF
    "readChangeFeed net changes" semantics):

    - final windowed event is a delete: net ``D`` if state existed before
      the window (image = pre-window state), else nothing;
    - final windowed event is an upsert: net ``U`` if state existed before,
      else net ``I`` (image = final event).

    Pure aggregation — two conditional max-struct accumulators per key, so
    it combines map-side and is skew-immune (no window function).
    """
    tagged = df.withColumn("__is_del", delete_predicate.cast("int"))
    img = F.struct(
        F.col(lsn_col).alias("__lsn"),
        F.col("__is_del"),
        *[F.col(c) for c in image_cols],
    )
    pre = F.max(F.when(F.col(lsn_col) < split_lsn, img)).alias("__pre")
    fin = F.max(F.when(F.col(lsn_col) >= split_lsn, img)).alias("__fin")
    g = tagged.groupBy(*key_cols).agg(pre, fin).filter(F.col("__fin").isNotNull())
    present = F.col("__pre").isNotNull() & (F.col("__pre.__is_del") == 0)
    net = (
        F.when(F.col("__fin.__is_del") == 1, F.when(present, F.lit("D")))
        .when(present, F.lit("U"))
        .otherwise(F.lit("I"))
    )
    g = g.withColumn("net_op", net).filter(F.col("net_op").isNotNull())
    image = F.when(F.col("net_op") == "D", F.col("__pre")).otherwise(F.col("__fin"))
    return g.select(
        *key_cols,
        "net_op",
        image["__lsn"].alias("img_lsn"),
        *[image[c].alias(f"img_{c}") for c in image_cols],
    )
