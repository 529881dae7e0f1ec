"""Incremental revalidation: differential against from-scratch validation
on add / modify / delete partition deltas."""

from __future__ import annotations

from cmem_plugin_pyshacl_spark.data_model import (
    EX,
    KIND_IRI,
    KIND_LITERAL,
    RDF_TYPE,
    SH,
    TRIPLES_SCHEMA,
    XSD_STRING,
)
from cmem_plugin_pyshacl_spark.plans.incremental import (
    incremental_revalidate,
    partition_fingerprints,
)
from cmem_plugin_pyshacl_spark.plans.shacl import validate
from cmem_plugin_pyshacl_spark.data_model import iri, lit_typed, triples_from_rows


def _shapes(spark):
    from cmem_plugin_pyshacl_spark.data_model import XSD_INTEGER

    return triples_from_rows(
        spark,
        [
            (EX + "S", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "S", SH + "targetClass", iri(EX + "Entity")),
            (EX + "S", SH + "property", iri(EX + "S/email")),
            (EX + "S/email", SH + "path", iri(EX + "email")),
            (EX + "S/email", SH + "minCount", lit_typed("1", XSD_INTEGER)),
            (EX + "S/email", SH + "maxCount", lit_typed("2", XSD_INTEGER)),
        ],
    )


def _base_rows(n=12):
    """Entity i in partition i % 4; entities with i % 3 == 0 have no email
    (violations by construction)."""
    rows = []
    for i in range(n):
        pid = i % 4
        s = f"urn:e{i}"
        rows.append((s, RDF_TYPE, KIND_IRI, EX + "Entity", None, None, "g", pid))
        if i % 3 != 0:
            rows.append(
                (s, EX + "email", KIND_LITERAL, f"e{i}@x.org", XSD_STRING, None, "g", pid)
            )
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, schema=TRIPLES_SCHEMA)


def _key(results):
    return {
        (r.focusNode, r.resultPath, r.value, r.sourceConstraintComponent, r.part_id)
        for r in results.collect()
    }


def test_bootstrap_equals_full_validation(spark):
    triples = _df(spark, _base_rows())
    shapes = _shapes(spark)
    state, reports, changed = incremental_revalidate(spark, triples, shapes)
    assert _key(state.results) == _key(validate(spark, triples, shapes))
    assert sorted(changed) == [0, 1, 2, 3]
    rep = {r.part_id: r.conforms for r in reports.collect()}
    assert set(rep) == {0, 1, 2, 3}


def test_modify_one_partition_differential(spark):
    shapes = _shapes(spark)
    rows = _base_rows()
    state0, _, _ = incremental_revalidate(spark, _df(spark, rows), shapes)

    # delete e1's email (partition 1 content changes; e1 becomes a
    # violation) and give e2 a third email (partition 2; maxCount)
    rows2 = [
        r for r in rows if not (r[0] == "urn:e1" and r[1] == EX + "email")
    ] + [("urn:e2", EX + "email", KIND_LITERAL, "extra1@x.org", XSD_STRING, None, "g", 2),
         ("urn:e2", EX + "email", KIND_LITERAL, "extra2@x.org", XSD_STRING, None, "g", 2)]
    t2 = _df(spark, rows2)
    state1, reports1, changed = incremental_revalidate(
        spark, t2, shapes, prior=state0
    )
    assert sorted(changed) == [1, 2]
    assert _key(state1.results) == _key(validate(spark, t2, shapes))
    bad = {r.part_id for r in reports1.collect() if not r.conforms}
    assert {1, 2}.issubset(bad)


def test_add_and_remove_partitions_differential(spark):
    shapes = _shapes(spark)
    rows = _base_rows()
    state0, _, _ = incremental_revalidate(spark, _df(spark, rows), shapes)

    # drop partition 3 entirely; add new partition 7 with a violating entity
    rows2 = [r for r in rows if r[7] != 3] + [
        ("urn:new", RDF_TYPE, KIND_IRI, EX + "Entity", None, None, "g", 7)
    ]
    t2 = _df(spark, rows2)
    state1, reports1, changed = incremental_revalidate(
        spark, t2, shapes, prior=state0
    )
    assert sorted(changed) == [3, 7]
    assert _key(state1.results) == _key(validate(spark, t2, shapes))
    # removed partition's focus nodes left no stale results
    assert not any(r.focusNode.startswith("urn:e3") and r.part_id == 3
                   for r in state1.results.collect())
    assert 7 in {r.part_id for r in reports1.collect()}


def test_no_change_short_circuits(spark):
    shapes = _shapes(spark)
    triples = _df(spark, _base_rows())
    state0, _, _ = incremental_revalidate(spark, triples, shapes)
    state1, reports, changed = incremental_revalidate(
        spark, triples, shapes, prior=state0
    )
    assert changed == []
    assert state1.results is state0.results  # carried over, not recomputed
    assert _key(state1.results) == _key(validate(spark, triples, shapes))


def test_fingerprints_are_order_independent(spark):
    rows = _base_rows()
    a = partition_fingerprints(_df(spark, rows)).collect()
    b = partition_fingerprints(_df(spark, list(reversed(rows))).repartition(7)).collect()
    assert {(r.part_id, r.fp, r.n_triples) for r in a} == {
        (r.part_id, r.fp, r.n_triples) for r in b
    }


def test_known_changed_fast_path_differential(spark):
    """known_changed: state maintenance reads only the named partitions;
    results still match from-scratch validation exactly."""
    shapes = _shapes(spark)
    rows = _base_rows()
    state0, _, _ = incremental_revalidate(spark, _df(spark, rows), shapes)
    state0 = type(state0)(
        state0.fingerprints.persist(), state0.mentions.persist(), state0.results.persist()
    )
    # rewrite partition 2 (drop e2's email entirely) and delete partition 3
    rows2 = [
        r for r in rows
        if r[7] != 3 and not (r[0] == "urn:e2" and r[1] == EX + "email")
    ]
    t2 = _df(spark, rows2)
    state1, reports1, touched = incremental_revalidate(
        spark, t2, shapes, prior=state0, known_changed=[2, 3]
    )
    assert sorted(touched) == [2, 3]
    assert _key(state1.results) == _key(validate(spark, t2, shapes))
    # carried-over fingerprints for untouched partitions match a full recompute
    full_fps = {(r.part_id, r.fp) for r in partition_fingerprints(t2).collect()}
    assert {(r.part_id, r.fp) for r in state1.fingerprints.collect()} == full_fps
    # no-op known_changed short-circuits
    state2, _, touched2 = incremental_revalidate(
        spark, t2, shapes, prior=state1, known_changed=[]
    )
    assert touched2 == [] and state2.results is state1.results


def test_run_pipeline_incremental_state_round_trip(spark, tmp_path):
    """run_pipeline(incremental=True): first run bootstraps and commits
    state; an identical second run detects zero changed partitions and
    reproduces the same results and reports."""
    from cmem_plugin_pyshacl_spark.plans.pipeline import run_pipeline
    from cmem_plugin_pyshacl_spark.sources.pages import generate_pages

    out = str(tmp_path / "incr_run")
    pages = generate_pages(spark, 120, num_partitions=4)
    shapes = _shapes_kg(spark)
    r1 = run_pipeline(spark, pages, shapes, out_dir=out, incremental=True)
    n1 = r1.results.count()
    rep1 = {(x.part_id, x.conforms) for x in r1.reports.collect()}
    assert sorted(r1.metrics["incremental_changed_parts"])  # bootstrap: all parts
    r2 = run_pipeline(spark, pages, shapes, out_dir=out, resume=True, incremental=True)
    assert r2.metrics["incremental_changed_parts"] == []
    assert r2.results.count() == n1
    assert {(x.part_id, x.conforms) for x in r2.reports.collect()} == rep1


def _shapes_kg(spark):
    from cmem_plugin_pyshacl_spark.data_model import XSD_INTEGER

    return triples_from_rows(
        spark,
        [
            (EX + "S", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "S", SH + "targetClass", iri(EX + "Person")),
            (EX + "S", SH + "property", iri(EX + "S/p")),
            (EX + "S/p", SH + "path", iri(EX + "basedIn")),
            (EX + "S/p", SH + "minCount", lit_typed("1", XSD_INTEGER)),
        ],
    )
