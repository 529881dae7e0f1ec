"""Property-based tests (hypothesis): path-algebra invariants, term-key
injectivity, and randomized count-constraint validation against a pure
python reference evaluator."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from cmem_plugin_pyshacl_spark.data_model import (
    EX,
    RDF_TYPE,
    SH,
    XSD_INTEGER,
    XSD_STRING,
    iri,
    lit_typed,
    triples_from_rows,
)
from cmem_plugin_pyshacl_spark.plans.shacl import (
    PAlt,
    PClosure,
    PInv,
    PPred,
    PSeq,
    _normalize_path,
    _path_display,
    _term_key_py,
    validate,
)

# ---------------------------------------------------------------- strategies
_preds = st.sampled_from(["a", "b", "c", "d"]).map(PPred)


def _trees():
    return st.recursive(
        _preds,
        lambda kids: st.one_of(
            kids.map(PInv),
            st.lists(kids, min_size=2, max_size=3).map(lambda xs: PSeq(tuple(xs))),
            st.lists(kids, min_size=2, max_size=3).map(lambda xs: PAlt(tuple(xs))),
            st.tuples(
                kids, st.sampled_from(["zeroOrMore", "oneOrMore", "zeroOrOne"])
            ).map(lambda t: PClosure(*t)),
        ),
        max_leaves=8,
    )


def _no_complex_inverse(e) -> bool:
    """Invariant: after normalization PInv only wraps PPred."""
    if isinstance(e, PPred):
        return True
    if isinstance(e, PInv):
        return isinstance(e.sub, PPred)
    if isinstance(e, (PSeq, PAlt)):
        return all(_no_complex_inverse(p) for p in e.parts)
    return _no_complex_inverse(e.sub)


@given(_trees())
@settings(max_examples=200, deadline=None)
def test_normalize_pushes_inverses_to_leaves(tree):
    n = _normalize_path(tree)
    assert _no_complex_inverse(n)


@given(_trees())
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent(tree):
    n = _normalize_path(tree)
    assert _normalize_path(n) == n


@given(_trees())
@settings(max_examples=200, deadline=None)
def test_double_inverse_cancels(tree):
    n1 = _normalize_path(_normalize_path(PInv(PInv(tree))))
    n2 = _normalize_path(tree)
    assert _path_display(n1) == _path_display(n2)


# ------------------------------------------------------------ term identity
_vals = st.text(
    alphabet=st.characters(blacklist_characters="\x01", codec="utf-8"),
    min_size=0,
    max_size=12,
)
_terms = st.tuples(
    _vals,
    st.sampled_from(["iri", "literal"]),
    st.one_of(st.none(), st.sampled_from([XSD_STRING, XSD_INTEGER])),
    st.one_of(st.none(), st.sampled_from(["en", "en-GB", "de"])),
)


def _canon(t):
    """RDF 1.1 canonical form of a term tuple (mirrors _term_key_py)."""
    v, kind, dt, lang = t
    if kind != "literal":
        return (kind, v, None, None)
    eff = dt or ("http://www.w3.org/1999/02/22-rdf-syntax-ns#langString" if lang else XSD_STRING)
    return (kind, v, eff, (lang or "").lower() or None)


@given(_terms, _terms)
@settings(max_examples=300, deadline=None)
def test_term_key_matches_canonical_equality(t1, t2):
    assert (_term_key_py(*t1) == _term_key_py(*t2)) == (_canon(t1) == _canon(t2))


# ------------------------------------------- randomized count constraints
@st.composite
def _graph_and_bounds(draw):
    n_subjects = draw(st.integers(min_value=1, max_value=8))
    counts = {
        f"urn:s{i}": draw(st.integers(min_value=0, max_value=4))
        for i in range(n_subjects)
    }
    min_c = draw(st.integers(min_value=0, max_value=3))
    max_c = draw(st.integers(min_value=min_c, max_value=4))
    return counts, min_c, max_c


@given(_graph_and_bounds())
@settings(max_examples=8, deadline=None)
def test_count_constraints_match_python_reference(spark, case):
    counts, min_c, max_c = case
    rows = []
    for s, k in counts.items():
        rows.append((s, RDF_TYPE, iri(EX + "T")))
        for j in range(k):
            rows.append((s, EX + "p", (f"v{j}", "literal", XSD_STRING, None)))
    data = triples_from_rows(spark, rows)
    shape_rows = [
        (EX + "S", RDF_TYPE, iri(SH + "NodeShape")),
        (EX + "S", SH + "targetClass", iri(EX + "T")),
        (EX + "S", SH + "property", iri(EX + "S-p")),
        (EX + "S-p", SH + "path", iri(EX + "p")),
        (EX + "S-p", SH + "minCount", lit_typed(str(min_c), XSD_INTEGER)),
        (EX + "S-p", SH + "maxCount", lit_typed(str(max_c), XSD_INTEGER)),
    ]
    res = validate(spark, data, triples_from_rows(spark, shape_rows))
    got = {(r.focusNode, r.sourceConstraintComponent) for r in res.collect()}
    expected = set()
    for s, k in counts.items():
        if min_c > 0 and k < min_c:
            expected.add((s, SH + "MinCountConstraintComponent"))
        if k > max_c:
            expected.add((s, SH + "MaxCountConstraintComponent"))
    assert got == expected
