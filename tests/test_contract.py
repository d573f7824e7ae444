"""Driver-contract invariants (no Spark session needed): the certification
window's composition is load-bearing — the driver certifies only the first
50 ``queries()`` entries, so a wiring mistake (duplicate key silently
collapsing the dict, a query without an oracle, a rotation that evicts a
never-certified operator) would cost a round of external certification.
"""

import ast
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod

WINDOW = 50


def test_every_query_has_an_oracle():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = [n for n in qs if n not in oracles]
    assert not missing, f"queries without oracle_sql entries: {missing}"
    orphans = [n for n in oracles if n not in qs]
    assert not orphans, f"oracles without queries entries: {orphans}"


def test_no_duplicate_dict_keys_in_source():
    """A duplicated literal key would silently collapse (dict semantics) and
    shift every later query's window position — parse the source AST."""
    src = Path(entrymod.__file__).read_text()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            keys = [k.value for k in node.keys if isinstance(k, ast.Constant)]
            assert len(keys) == len(set(keys)), sorted(
                k for k in set(keys) if keys.count(k) > 1
            )


def test_window_holds_priority_queries():
    """Round-5 rotation invariant (VERDICT r4 items 1/5/6): every query
    with NO driver CORRECTNESS row — the 28 post-r4-window additions plus
    the new composed corpus build — and the queries riding modules changed
    during r5 (streaming/runner.py + stream_ingest.py txn-gate fixes) must
    sit inside the 50-entry certification window."""
    first = list(entrymod.queries())[:WINDOW]
    never_certified = [
        "edit_pairs", "co_change_graph", "stream_stream_join",
        "stream_stream_left_join", "cdf_replica_read",
        "ivf_index_replica_read", "join_view_read", "fim_transform",
        "intradoc_line_dedup", "contamination_overlap_score",
        "files_inspect_read", "purge_cascade_read", "constraint_gate_read",
        "quarantine_read", "bitemporal_read", "txn_read",
        "temperature_mixing", "cdf_preimages_read", "knn_graph_clusters",
        "knn_graph_clusters_lsh", "merge_multi_read", "txn_gate_read",
        "column_default_read", "shard_plan", "merge_cascade_read",
        "count_meta_read", "commit_summary_read", "stream_txn_gate_read",
        "corpus_build_read",
    ]
    r5_module_touched = ["stream_ingest_read", "replay_read"]
    # the six r4-touched-module queries the temporal family displaced past
    # the r4 boundary (VERDICT handed them to the r5 rotation), plus the
    # heavy LSH representatives whose wrappers the late-r4 `_spread`
    # fan-out touched after their last driver rows
    displaced_and_lsh = [
        "derived_file_stats", "aggregate_repo_stats",
        "incremental_minhash_index", "index_dup_candidates",
        "dup_clusters", "minhash_dup_pairs", "simhash_dup_pairs",
        "simhash_dup_pairs_wide", "minhash_dup_pairs_wide",
        "chunk_minhash_dups", "repo_level_neardup",
    ]
    out = [
        n
        for n in never_certified + r5_module_touched + displaced_and_lsh
        if n not in first
    ]
    assert not out, f"priority queries outside the certification window: {out}"
