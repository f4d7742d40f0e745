"""Pin the static Spark Connect compatibility audit (tools/
connect_audit.py): grpcio is absent in this container, so a live
Connect smoke test is impossible — this is the strongest checkable
form of the claim that the data-plane core never touches the JVM
gateway.  A new ``_jdf``/``_jvm``/``sparkContext``/``.rdd`` use
anywhere in the package fails here until it is consciously classified
(guarded fallback, or a documented classic-only feature)."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

import connect_audit  # noqa: E402


def test_no_unclassified_classic_api_touches() -> None:
    hits = connect_audit.audit()
    assert hits, "audit found nothing — walker is broken"
    unclassified = [h for h in hits if h["class"] == "UNCLASSIFIED"]
    assert not unclassified, (
        "new classic-only API touches need classification in "
        f"tools/connect_audit.py: {unclassified}"
    )


def test_core_modules_connect_clean() -> None:
    """Every touch inside a CORE_CLEAN module must be guarded (its
    enclosing function degrades via try/except instead of raising on a
    Connect session)."""
    hits = connect_audit.audit()
    bad = [
        h
        for h in hits
        if h["file"] in connect_audit.CORE_CLEAN and h["class"] != "guarded"
    ]
    assert not bad, f"unguarded classic API in core data-plane modules: {bad}"


def test_guarded_set_is_exactly_the_reviewed_one() -> None:
    """The guarded list is a reviewed claim (each has a try/except
    fallback verified by hand) — additions must be re-reviewed here,
    not silently absorbed."""
    hits = connect_audit.audit()
    guarded = {(h["file"], h["func"]) for h in hits if h["class"] == "guarded"}
    assert guarded == {
        ("functions/scale.py", "shuffle_partitions"),
        ("functions/dedup.py", "spread_for_compute"),
        # r16: the lsh pair-respread width — same try/except →
        # shuffle_partitions fallback pattern as spread_for_compute
        ("functions/similarity.py", "lsh_topk"),
        # r16: the blocked all-pairs scorer's block-pair width — same
        # try/except → shuffle_partitions fallback pattern
        ("functions/similarity.py", "exact_cosine_pairs"),
        ("logutil.py", "silence_benign_scheduler_spam"),
    }
