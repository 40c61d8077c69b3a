"""Connected-components dedup (transitive closure over near-dup pairs):
propagation correctness on hand-built graphs, convergence on chains,
and the iteration bound."""

from __future__ import annotations

from philotes_spark.dedup.components import connected_components, dedup_components


def _labels(df):
    return {r.node: r.component for r in df.collect()}


def test_chain_closes_transitively(spark):
    # A~B, B~C, C~D: single-pass min would leave D→C; closure maps all→A
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "a long, b long")
    assert _labels(connected_components(pairs)) == {1: 1, 2: 1, 3: 1, 4: 1}


def test_multiple_components_and_reversed_edges(spark):
    pairs = spark.createDataFrame(
        [(9, 5), (5, 7), (20, 21), (30, 30)], "a long, b long"
    )
    got = _labels(connected_components(pairs))
    assert got == {5: 5, 7: 5, 9: 5, 20: 20, 21: 20, 30: 30}


def test_long_chain_needs_multiple_rounds(spark):
    # a 12-node path: min label must travel the whole diameter
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 112)], "a long, b long"
    )
    got = _labels(connected_components(pairs))
    assert set(got.values()) == {100}
    # and the iteration bound is respected (too-small max_iter → partial
    # labels under O(diameter) propagation)
    partial = _labels(
        connected_components(pairs, max_iter=2, algorithm="propagate")
    )
    assert set(partial.values()) != {100}


def test_both_algorithms_agree(spark):
    import random

    rng = random.Random(11)
    pairs = spark.createDataFrame(
        [(rng.randrange(60), rng.randrange(60)) for _ in range(80)],
        "a long, b long",
    )
    star = _labels(connected_components(pairs, algorithm="star"))
    prop = _labels(connected_components(pairs, algorithm="propagate"))
    assert star == prop


def test_path_graph_converges_in_log_rounds(spark):
    """VERDICT r04 #7: the adversarial case for propagation — a
    1000-node path (diameter 999). Large-star/small-star must close it
    within ceil(log2(1000)) + c = 13 alternation rounds; O(diameter)
    propagation given the same budget must NOT (that contrast is what
    proves the bound is doing the work)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], "a long, b long"
    )
    got = _labels(connected_components(pairs, max_iter=13, algorithm="star"))
    assert len(got) == 1000
    assert set(got.values()) == {0}

    partial = _labels(
        connected_components(pairs, max_iter=13, algorithm="propagate")
    )
    assert set(partial.values()) != {0}


def test_dedup_assignment_covers_unpaired_universe(spark):
    pairs = spark.createDataFrame([(2, 5), (5, 8)], "a long, b long")
    universe = spark.createDataFrame([(i,) for i in range(1, 10)], "doc long")
    got = {
        r.doc: (r.canonical_id, r.is_duplicate)
        for r in dedup_components(pairs, universe, "doc").collect()
    }
    assert got[2] == (2, False)  # component minimum keeps itself
    assert got[5] == (2, True)
    assert got[8] == (2, True)  # transitively, not just directly
    for lone in (1, 3, 4, 6, 7, 9):
        assert got[lone] == (lone, False)
