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
    """Operators that were never externally certified before r3, plus every
    operator new in r3, must sit inside the 50-entry window."""
    first = list(entrymod.queries())[:WINDOW]
    never_certified_before_r3 = [
        "simhash_dup_pairs", "decontamination", "c4_line_dedup",
        "ivf_train_kmeans", "ivf_topk_trained", "ann_recall_at_k",
        "pii_scrub", "sequence_packing", "stratified_sample",
        "corpus_prep_neardup",
    ]
    new_in_r3 = [
        "errors_by_message", "sql_model_vocab_enriched", "obx_epi_split",
        "multimodal_extract_features", "simhash_dup_pairs_wide",
        "secret_scan", "repo_level_neardup", "bpe_pair_counts",
        "substring_span_dedup", "embedding_cosine_dups_wide",
        "chunk_minhash_dups", "dataset_split_assign",
        "minhash_dup_pairs_wide", "corpus_release_report",
    ]
    out = [n for n in never_certified_before_r3 + new_in_r3 if n not in first]
    assert not out, f"priority queries outside the certification window: {out}"
