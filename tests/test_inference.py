"""RDFS inference subset tests (rdfs2/3/7/9/11 via plans/inference.py)."""

from __future__ import annotations

from cmem_plugin_pyshacl_spark.data_model import (
    EX,
    RDF_TYPE,
    RDFS_SUBCLASSOF,
    XSD_INTEGER,
    iri,
    lit_typed,
    triples_from_rows,
)
from cmem_plugin_pyshacl_spark.plans.inference import (
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDFS_SUBPROPERTYOF,
    rdfs_inference,
)


def _types(df):
    return {
        (r.s, r.o_value)
        for r in df.filter(df.p == RDF_TYPE).select("s", "o_value").collect()
    }


def test_rdfs9_subclass_transitive(spark):
    t = triples_from_rows(
        spark,
        [
            (EX + "A", RDFS_SUBCLASSOF, iri(EX + "B")),
            (EX + "B", RDFS_SUBCLASSOF, iri(EX + "C")),
            ("urn:x", RDF_TYPE, iri(EX + "A")),
        ],
    )
    types = _types(rdfs_inference(t))
    assert ("urn:x", EX + "A") in types
    assert ("urn:x", EX + "B") in types
    assert ("urn:x", EX + "C") in types  # transitive closure (rdfs11 + rdfs9)


def test_rdfs7_subproperty(spark):
    t = triples_from_rows(
        spark,
        [
            (EX + "email", RDFS_SUBPROPERTYOF, iri(EX + "contact")),
            ("urn:x", EX + "email", lit_typed("x@y.z")),
        ],
    )
    out = rdfs_inference(t)
    rows = {(r.p, r.o_value) for r in out.filter(out.s == "urn:x").collect()}
    assert (EX + "contact", "x@y.z") in rows


def test_rdfs2_domain_rdfs3_range(spark):
    t = triples_from_rows(
        spark,
        [
            (EX + "worksAt", RDFS_DOMAIN, iri(EX + "Person")),
            (EX + "worksAt", RDFS_RANGE, iri(EX + "Org")),
            ("urn:p", EX + "worksAt", iri("urn:o")),
            ("urn:p2", EX + "worksAt", lit_typed("not-an-iri")),
        ],
    )
    types = _types(rdfs_inference(t))
    assert ("urn:p", EX + "Person") in types
    assert ("urn:o", EX + "Org") in types
    assert ("urn:p2", EX + "Person") in types  # domain applies to literals too
    # range must NOT type a literal object
    assert all(s != "not-an-iri" for s, _ in types)


def test_ontology_inoculation(spark):
    data = triples_from_rows(spark, [("urn:x", RDF_TYPE, iri(EX + "A"))])
    ont = triples_from_rows(spark, [(EX + "A", RDFS_SUBCLASSOF, iri(EX + "B"))])
    types = _types(rdfs_inference(data, ont))
    assert ("urn:x", EX + "B") in types


def test_idempotent(spark):
    t = triples_from_rows(
        spark,
        [
            (EX + "A", RDFS_SUBCLASSOF, iri(EX + "B")),
            ("urn:x", RDF_TYPE, iri(EX + "A")),
        ],
    )
    once = rdfs_inference(t)
    twice = rdfs_inference(once)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


# ------------------------------------------------- OWL subset (round 2)
def test_owl_equivalent_class(spark):
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_EQ_CLASS,
        apply_inference,
    )

    data = triples_from_rows(
        spark,
        [
            (EX + "A", OWL_EQ_CLASS, iri(EX + "B")),
            ("urn:x", RDF_TYPE, iri(EX + "A")),
            ("urn:y", RDF_TYPE, iri(EX + "B")),
        ],
    )
    types = _types(apply_inference(data, profile="owlrl"))
    assert ("urn:x", EX + "B") in types and ("urn:y", EX + "A") in types


def test_owl_equivalent_property(spark):
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_EQ_PROP,
        apply_inference,
    )

    data = triples_from_rows(
        spark,
        [
            (EX + "p", OWL_EQ_PROP, iri(EX + "q")),
            ("urn:x", EX + "p", iri("urn:y")),
        ],
    )
    out = apply_inference(data, profile="both")
    got = {(r.s, r.p, r.o_value) for r in out.collect()}
    assert ("urn:x", EX + "q", "urn:y") in got


def test_owl_inverse_of(spark):
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_INVERSE_OF,
        apply_inference,
    )

    data = triples_from_rows(
        spark,
        [
            (EX + "parentOf", OWL_INVERSE_OF, iri(EX + "childOf")),
            ("urn:x", EX + "parentOf", iri("urn:y")),
            ("urn:z", EX + "childOf", iri("urn:w")),
        ],
    )
    out = apply_inference(data, profile="owlrl")
    got = {(r.s, r.p, r.o_value) for r in out.collect()}
    assert ("urn:y", EX + "childOf", "urn:x") in got
    assert ("urn:w", EX + "parentOf", "urn:z") in got


def test_owl_symmetric(spark):
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_SYMMETRIC,
        apply_inference,
    )

    data = triples_from_rows(
        spark,
        [
            (EX + "knows", RDF_TYPE, iri(OWL_SYMMETRIC)),
            ("urn:x", EX + "knows", iri("urn:y")),
        ],
    )
    out = apply_inference(data, profile="owlrl")
    got = {(r.s, r.p, r.o_value) for r in out.collect()}
    assert ("urn:y", EX + "knows", "urn:x") in got


def test_rdfs_profile_ignores_owl(spark):
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_EQ_CLASS,
        apply_inference,
    )

    data = triples_from_rows(
        spark,
        [
            (EX + "A", OWL_EQ_CLASS, iri(EX + "B")),
            ("urn:x", RDF_TYPE, iri(EX + "A")),
        ],
    )
    types = _types(apply_inference(data, profile="rdfs"))
    assert ("urn:x", EX + "B") not in types


def test_owl_transitive_property(spark):
    """prp-trp: a 6-hop ancestor chain fully closes (all pairs i<j), and
    non-declared predicates are untouched (round-2 VERDICT task 4)."""
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_TRANSITIVE,
        apply_inference,
    )

    rows = [(EX + "ancestorOf", RDF_TYPE, iri(OWL_TRANSITIVE))]
    for i in range(6):
        rows.append((f"urn:g{i}", EX + "ancestorOf", iri(f"urn:g{i + 1}")))
    rows.append(("urn:g0", EX + "likes", iri("urn:g1")))
    rows.append(("urn:g1", EX + "likes", iri("urn:g2")))
    data = triples_from_rows(spark, rows)
    out = apply_inference(data, profile="owlrl")
    got = {(r.s, r.o_value) for r in out.collect() if r.p == EX + "ancestorOf"}
    want = {(f"urn:g{i}", f"urn:g{j}") for i in range(7) for j in range(7) if i < j}
    assert got == want
    likes = {(r.s, r.o_value) for r in out.collect() if r.p == EX + "likes"}
    assert likes == {("urn:g0", "urn:g1"), ("urn:g1", "urn:g2")}  # NOT closed


def test_owl_transitive_feeds_type_rules(spark):
    """Entailed transitive edges must feed rdfs2 domain typing (rule order:
    transitive runs before domain/range)."""
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_TRANSITIVE,
        RDFS_DOMAIN,
        apply_inference,
    )

    data = triples_from_rows(
        spark,
        [
            (EX + "partOf", RDF_TYPE, iri(OWL_TRANSITIVE)),
            (EX + "partOf", RDFS_DOMAIN, iri(EX + "Component")),
            ("urn:a", EX + "partOf", iri("urn:b")),
            ("urn:b", EX + "partOf", iri("urn:c")),
        ],
    )
    out = apply_inference(data, profile="owlrl")
    types = {(r.s, r.o_value) for r in out.collect() if r.p == RDF_TYPE}
    assert ("urn:a", EX + "Component") in types
    got = {(r.s, r.o_value) for r in out.collect() if r.p == EX + "partOf"}
    assert ("urn:a", "urn:c") in got


def test_owl_property_chain(spark):
    """prp-spo2: hasParent o hasParent => hasGrandparent, including a
    chain whose FINAL hop lands on a literal-valued predicate."""
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_PROP_CHAIN,
        RDF_FIRST,
        RDF_NIL,
        RDF_REST,
        apply_inference,
    )

    data = triples_from_rows(
        spark,
        [
            (EX + "hasGrandparent", OWL_PROP_CHAIN, iri("urn:l1")),
            ("urn:l1", RDF_FIRST, iri(EX + "hasParent")),
            ("urn:l1", RDF_REST, iri("urn:l2")),
            ("urn:l2", RDF_FIRST, iri(EX + "hasParent")),
            ("urn:l2", RDF_REST, iri(RDF_NIL)),
            # 3-element chain ending in a literal-valued predicate
            (EX + "grandparentName", OWL_PROP_CHAIN, iri("urn:m1")),
            ("urn:m1", RDF_FIRST, iri(EX + "hasParent")),
            ("urn:m1", RDF_REST, iri("urn:m2")),
            ("urn:m2", RDF_FIRST, iri(EX + "hasParent")),
            ("urn:m2", RDF_REST, iri("urn:m3")),
            ("urn:m3", RDF_FIRST, iri(EX + "name")),
            ("urn:m3", RDF_REST, iri(RDF_NIL)),
            ("urn:kid", EX + "hasParent", iri("urn:dad")),
            ("urn:dad", EX + "hasParent", iri("urn:gramps")),
            ("urn:gramps", EX + "name", lit_typed("Abe", None)),
        ],
    )
    out = apply_inference(data, profile="owlrl")
    gp = {(r.s, r.o_value) for r in out.collect() if r.p == EX + "hasGrandparent"}
    assert gp == {("urn:kid", "urn:gramps")}
    names = [
        r for r in out.collect() if r.p == EX + "grandparentName"
    ]
    assert len(names) == 1
    assert (names[0].s, names[0].o_value, names[0].o_kind) == (
        "urn:kid",
        "Abe",
        "literal",
    )


def test_owl_same_as_materialization(spark):
    """eq-sym/eq-trans/eq-rep: a 3-node identity chain replicates every
    member's triples onto every other member, entails all pairwise
    sameAs, and feeds rdfs9 typing through the replicated rdf:type."""
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_SAMEAS,
        apply_inference,
    )

    data = triples_from_rows(
        spark,
        [
            ("urn:a", OWL_SAMEAS, iri("urn:b")),
            ("urn:b", OWL_SAMEAS, iri("urn:c")),
            ("urn:a", EX + "age", lit_typed("42", None)),
            ("urn:c", RDF_TYPE, iri(EX + "Person")),
            (EX + "Person", RDFS_SUBCLASSOF, iri(EX + "Agent")),
            ("urn:z", EX + "knows", iri("urn:b")),
        ],
    )
    out = apply_inference(data, profile="owlrl").collect()
    sames = {(r.s, r.o_value) for r in out if r.p == OWL_SAMEAS}
    nodes = ["urn:a", "urn:b", "urn:c"]
    assert sames == {(x, y) for x in nodes for y in nodes if x != y}
    ages = {r.s for r in out if r.p == EX + "age"}
    assert ages == set(nodes)  # eq-rep-s
    knows = {(r.s, r.o_value) for r in out if r.p == EX + "knows"}
    assert knows == {("urn:z", n) for n in nodes}  # eq-rep-o
    types = {(r.s, r.o_value) for r in out if r.p == RDF_TYPE}
    for n in nodes:  # replicated type feeds rdfs9
        assert (n, EX + "Person") in types
        assert (n, EX + "Agent") in types


def test_same_as_canonicalize(spark):
    """The scale path: rewrite to the min-IRI representative, drop sameAs
    edges, never grow the triple set."""
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_SAMEAS,
        same_as_canonicalize,
    )

    data = triples_from_rows(
        spark,
        [
            ("urn:b", OWL_SAMEAS, iri("urn:a")),
            ("urn:b", EX + "age", lit_typed("42", None)),
            ("urn:z", EX + "knows", iri("urn:b")),
            ("urn:z", EX + "knows", iri("urn:a")),  # merges with the rewrite
        ],
    )
    out = same_as_canonicalize(data).collect()
    assert all(r.p != OWL_SAMEAS for r in out)
    assert {(r.s, r.p, r.o_value) for r in out} == {
        ("urn:a", EX + "age", "42"),
        ("urn:z", EX + "knows", "urn:a"),
    }


def test_owl_functional_property_entails_same_as(spark):
    """prp-fp: two resource objects of a functional property become
    sameAs-identified, and the sameAs step that follows replicates their
    triples (one ordered pass: fp feeds sameAs)."""
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_FUNCTIONAL,
        OWL_SAMEAS,
        apply_inference,
    )

    data = triples_from_rows(
        spark,
        [
            (EX + "hasMother", RDF_TYPE, iri(OWL_FUNCTIONAL)),
            ("urn:kid", EX + "hasMother", iri("urn:m1")),
            ("urn:kid", EX + "hasMother", iri("urn:m2")),
            ("urn:m2", EX + "city", iri("urn:berlin")),
            # literal-valued functional clash: out of scope, must NOT
            # produce sameAs rows
            (EX + "age", RDF_TYPE, iri(OWL_FUNCTIONAL)),
            ("urn:kid", EX + "age", lit_typed("5", XSD_INTEGER)),
            ("urn:kid", EX + "age", lit_typed("6", XSD_INTEGER)),
        ],
    )
    out = apply_inference(data, profile="owlrl").collect()
    same = {(r.s, r.o_value) for r in out if r.p == OWL_SAMEAS}
    assert ("urn:m2", "urn:m1") in same or ("urn:m1", "urn:m2") in same
    assert not any("urn:kid" in pair for pair in same)
    # eq-rep: m1 inherits m2's city through the sameAs cluster step
    cities = {(r.s, r.o_value) for r in out if r.p == EX + "city"}
    assert ("urn:m1", "urn:berlin") in cities


def test_owl_inverse_functional_property(spark):
    """prp-ifp keys on the FULL object term: a shared literal email
    identifies subjects; equal lexical forms under different datatypes do
    NOT conflate."""
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_INV_FUNCTIONAL,
        OWL_SAMEAS,
        apply_inference,
    )
    from cmem_plugin_pyshacl_spark.data_model import XSD_STRING

    data = triples_from_rows(
        spark,
        [
            (EX + "email", RDF_TYPE, iri(OWL_INV_FUNCTIONAL)),
            ("urn:a", EX + "email", lit_typed("x@y.z", XSD_STRING)),
            ("urn:b", EX + "email", lit_typed("x@y.z", XSD_STRING)),
            ("urn:c", EX + "email", lit_typed("other@y.z", XSD_STRING)),
            # same lexical form, different datatype -> distinct term
            (EX + "code", RDF_TYPE, iri(OWL_INV_FUNCTIONAL)),
            ("urn:d", EX + "code", lit_typed("5", XSD_INTEGER)),
            ("urn:e", EX + "code", lit_typed("5", XSD_STRING)),
        ],
    )
    out = apply_inference(data, profile="owlrl").collect()
    same = {frozenset((r.s, r.o_value)) for r in out if r.p == OWL_SAMEAS}
    assert frozenset(("urn:a", "urn:b")) in same
    assert not any("urn:c" in p for p in same)
    assert not any("urn:d" in p or "urn:e" in p for p in same)


def test_owl_has_value_both_directions(spark):
    """cls-hv1/cls-hv2 (owlrl 7.1.4 Restriction semantics,
    plugin_pyshacl.py:238-249): a hasValue restriction entails the value
    from the type and the type from the value — with FULL-term matching,
    so "1"^^xsd:string never triggers the xsd:integer restriction."""
    from cmem_plugin_pyshacl_spark.data_model import XSD_STRING
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_HAS_VALUE,
        OWL_ON_PROPERTY,
        apply_inference,
    )

    R = EX + "AdultR"
    data = triples_from_rows(
        spark,
        [
            (R, OWL_ON_PROPERTY, iri(EX + "adult")),
            (R, OWL_HAS_VALUE, lit_typed("1", XSD_INTEGER)),
            # hv2: value => type
            ("urn:x", EX + "adult", lit_typed("1", XSD_INTEGER)),
            # same lexical form, wrong datatype => NOT typed
            ("urn:y", EX + "adult", lit_typed("1", XSD_STRING)),
            # hv1: type => value
            ("urn:z", RDF_TYPE, iri(R)),
        ],
    )
    out = apply_inference(data, profile="owlrl").collect()
    types = {(r.s, r.o_value) for r in out if r.p == RDF_TYPE}
    assert ("urn:x", R) in types
    assert ("urn:y", R) not in types
    vals = {
        (r.s, r.o_value, r.o_datatype) for r in out if r.p == EX + "adult"
    }
    assert ("urn:z", "1", XSD_INTEGER) in vals


def test_owl_has_value_feeds_subclass(spark):
    """hv2 runs before rdfs9: an entailed restriction type flows through
    the subclass closure (R subClassOf C => x type C)."""
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_HAS_VALUE,
        OWL_ON_PROPERTY,
        apply_inference,
    )

    R = EX + "BerlinerR"
    data = triples_from_rows(
        spark,
        [
            (R, OWL_ON_PROPERTY, iri(EX + "city")),
            (R, OWL_HAS_VALUE, iri("urn:berlin")),
            (R, RDFS_SUBCLASSOF, iri(EX + "Person")),
            ("urn:x", EX + "city", iri("urn:berlin")),
        ],
    )
    types = _types(apply_inference(data, profile="owlrl"))
    assert ("urn:x", R) in types
    assert ("urn:x", EX + "Person") in types


def test_owl_some_values_from(spark):
    """cls-svf1: (x p y), (y type D) => (x type R); no entailment when
    the object lacks the class."""
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_ON_PROPERTY,
        OWL_SOME_VALUES,
        apply_inference,
    )

    R = EX + "DogOwnerR"
    data = triples_from_rows(
        spark,
        [
            (R, OWL_ON_PROPERTY, iri(EX + "owns")),
            (R, OWL_SOME_VALUES, iri(EX + "Dog")),
            ("urn:a", EX + "owns", iri("urn:rex")),
            ("urn:rex", RDF_TYPE, iri(EX + "Dog")),
            ("urn:b", EX + "owns", iri("urn:tom")),
            ("urn:tom", RDF_TYPE, iri(EX + "Cat")),
        ],
    )
    types = _types(apply_inference(data, profile="owlrl"))
    assert ("urn:a", R) in types
    assert ("urn:b", R) not in types


def test_owl_all_values_from(spark):
    """cls-avf: (x type R), (x p y) => (y type D); untyped subjects'
    objects are untouched."""
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_ALL_VALUES,
        OWL_ON_PROPERTY,
        apply_inference,
    )

    R = EX + "DogPound"
    data = triples_from_rows(
        spark,
        [
            (R, OWL_ON_PROPERTY, iri(EX + "holds")),
            (R, OWL_ALL_VALUES, iri(EX + "Dog")),
            ("urn:pound", RDF_TYPE, iri(R)),
            ("urn:pound", EX + "holds", iri("urn:rex")),
            ("urn:pound", EX + "holds", iri("urn:fido")),
            ("urn:other", EX + "holds", iri("urn:tom")),
        ],
    )
    types = _types(apply_inference(data, profile="owlrl"))
    assert ("urn:rex", EX + "Dog") in types
    assert ("urn:fido", EX + "Dog") in types
    assert ("urn:tom", EX + "Dog") not in types


def _rdf_list(head, items):
    """Rows for an RDF collection starting at bnode id `head`."""
    from cmem_plugin_pyshacl_spark.plans.inference import (
        RDF_FIRST,
        RDF_NIL,
        RDF_REST,
    )

    rows = []
    for i, item in enumerate(items):
        node = head if i == 0 else f"{head}-{i}"
        nxt = RDF_NIL if i == len(items) - 1 else f"{head}-{i + 1}"
        rows.append((node, RDF_FIRST, iri(item)))
        rows.append((node, RDF_REST, iri(nxt)))
    return rows


def test_owl_union_of(spark):
    """scm-uni + rdfs9 (= cls-uni): members of a unionOf class are
    subclasses of it, so their instances get the union type; the union
    class's own superclasses apply too."""
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_UNION_OF,
        apply_inference,
    )

    U = EX + "PetU"
    data = triples_from_rows(
        spark,
        [
            (U, OWL_UNION_OF, iri("_:u0")),
            *_rdf_list("_:u0", [EX + "Dog", EX + "Cat"]),
            (U, RDFS_SUBCLASSOF, iri(EX + "Animal")),
            ("urn:rex", RDF_TYPE, iri(EX + "Dog")),
            ("urn:tom", RDF_TYPE, iri(EX + "Cat")),
            ("urn:nemo", RDF_TYPE, iri(EX + "Fish")),
        ],
    )
    types = _types(apply_inference(data, profile="owlrl"))
    assert ("urn:rex", U) in types and ("urn:tom", U) in types
    assert ("urn:rex", EX + "Animal") in types
    assert ("urn:nemo", U) not in types


def test_owl_intersection_of(spark):
    """scm-int (intersection subClassOf each member, via rdfs9) and
    cls-int1 (all members held => intersection type, + one subclass
    hop for the intersection's own superclasses)."""
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_INTERSECTION_OF,
        apply_inference,
    )

    I = EX + "WorkingDog"
    data = triples_from_rows(
        spark,
        [
            (I, OWL_INTERSECTION_OF, iri("_:i0")),
            *_rdf_list("_:i0", [EX + "Dog", EX + "Worker"]),
            (I, RDFS_SUBCLASSOF, iri(EX + "Useful")),
            # scm-int: declared instance of I gets both member types
            ("urn:lassie", RDF_TYPE, iri(I)),
            # cls-int1: both member types => I (and I's superclass)
            ("urn:rex", RDF_TYPE, iri(EX + "Dog")),
            ("urn:rex", RDF_TYPE, iri(EX + "Worker")),
            # only one member: NOT I
            ("urn:fido", RDF_TYPE, iri(EX + "Dog")),
        ],
    )
    types = _types(apply_inference(data, profile="owlrl"))
    assert ("urn:lassie", EX + "Dog") in types
    assert ("urn:lassie", EX + "Worker") in types
    assert ("urn:rex", I) in types
    assert ("urn:rex", EX + "Useful") in types
    assert ("urn:fido", I) not in types


def test_owl_has_key(spark):
    """prp-key: instances of the keyed class sharing a value for EVERY
    key property are sameAs-identified (and the sameAs step replicates
    their triples); sharing only one of two key properties is not
    enough, and equal lexical forms under different datatypes don't
    match."""
    from cmem_plugin_pyshacl_spark.data_model import XSD_STRING
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_HAS_KEY,
        OWL_SAMEAS,
        apply_inference,
    )

    C = EX + "Citizen"
    data = triples_from_rows(
        spark,
        [
            (C, OWL_HAS_KEY, iri("_:k0")),
            *_rdf_list("_:k0", [EX + "ssn", EX + "country"]),
            ("urn:a", RDF_TYPE, iri(C)),
            ("urn:a", EX + "ssn", lit_typed("123", XSD_STRING)),
            ("urn:a", EX + "country", iri("urn:de")),
            ("urn:a", EX + "name", lit_typed("Alice")),
            # same ssn AND country -> sameAs a
            ("urn:b", RDF_TYPE, iri(C)),
            ("urn:b", EX + "ssn", lit_typed("123", XSD_STRING)),
            ("urn:b", EX + "country", iri("urn:de")),
            # same ssn, different country -> NOT sameAs
            ("urn:c", RDF_TYPE, iri(C)),
            ("urn:c", EX + "ssn", lit_typed("123", XSD_STRING)),
            ("urn:c", EX + "country", iri("urn:fr")),
            # same lexical ssn but integer-typed, same country -> NOT sameAs
            ("urn:d", RDF_TYPE, iri(C)),
            ("urn:d", EX + "ssn", lit_typed("123", XSD_INTEGER)),
            ("urn:d", EX + "country", iri("urn:de")),
            # matching values but NOT typed with the keyed class
            ("urn:e", EX + "ssn", lit_typed("123", XSD_STRING)),
            ("urn:e", EX + "country", iri("urn:de")),
        ],
    )
    out = apply_inference(data, profile="owlrl").collect()
    same = {frozenset((r.s, r.o_value)) for r in out if r.p == OWL_SAMEAS}
    assert frozenset(("urn:a", "urn:b")) in same
    assert not any("urn:c" in p or "urn:d" in p or "urn:e" in p for p in same)
    # eq-rep: b inherits a's name through the sameAs cluster step
    names = {(r.s, r.o_value) for r in out if r.p == EX + "name"}
    assert ("urn:b", "Alice") in names


# ---- OWL-RL consistency detection (false-conclusion rules) ----


def _clashes(df):
    return {(r.node, r.rule, r.detail) for r in df.collect()}


def test_consistency_irreflexive_and_asymmetric(spark):
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL,
        OWL_IRREFLEXIVE,
        consistency_report,
    )

    t = triples_from_rows(
        spark,
        [
            (EX + "parentOf", RDF_TYPE, iri(OWL_IRREFLEXIVE)),
            (EX + "parentOf", RDF_TYPE, iri(OWL + "AsymmetricProperty")),
            ("urn:a", EX + "parentOf", iri("urn:a")),       # prp-irp
            ("urn:b", EX + "parentOf", iri("urn:c")),
            ("urn:c", EX + "parentOf", iri("urn:b")),       # prp-asyp both ways
            ("urn:d", EX + "parentOf", iri("urn:e")),       # fine
            # literal object with the subject's lexical form must NOT match
            ("urn:f", EX + "parentOf", lit_typed("urn:f")),
        ],
    )
    got = _clashes(consistency_report(t))
    assert ("urn:a", "prp-irp", EX + "parentOf") in got
    # the self-loop also satisfies the asymmetric self-join
    assert ("urn:b", "prp-asyp", EX + "parentOf") in got
    assert ("urn:c", "prp-asyp", EX + "parentOf") in got
    assert not any(n in ("urn:d", "urn:e", "urn:f") for n, _r, _d in got)


def test_consistency_disjoint_classes_and_properties(spark):
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_DISJOINT_WITH,
        OWL_PROP_DISJOINT,
        consistency_report,
    )

    t = triples_from_rows(
        spark,
        [
            (EX + "Cat", OWL_DISJOINT_WITH, iri(EX + "Dog")),
            ("urn:felix", RDF_TYPE, iri(EX + "Cat")),
            ("urn:felix", RDF_TYPE, iri(EX + "Dog")),       # cax-dw
            ("urn:rex", RDF_TYPE, iri(EX + "Dog")),         # fine
            (EX + "likes", OWL_PROP_DISJOINT, iri(EX + "hates")),
            ("urn:x", EX + "likes", iri("urn:y")),
            ("urn:x", EX + "hates", iri("urn:y")),          # prp-pdw
            ("urn:x", EX + "hates", iri("urn:z")),          # different object: fine
            # typed-literal objects must match on the FULL term
            ("urn:w", EX + "likes", lit_typed("5", XSD_INTEGER)),
            ("urn:w", EX + "hates", lit_typed("5")),        # xsd:string vs integer
        ],
    )
    got = _clashes(consistency_report(t))
    assert ("urn:felix", "cax-dw", EX + "Cat|" + EX + "Dog") in got
    assert ("urn:x", "prp-pdw", EX + "likes|" + EX + "hates") in got
    assert not any(n == "urn:w" for n, _r, _d in got)
    assert not any(n == "urn:rex" for n, _r, _d in got)


def test_consistency_same_and_different_and_nothing(spark):
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_DIFFERENT_FROM,
        OWL_NOTHING,
        OWL_SAMEAS,
        consistency_report,
    )

    t = triples_from_rows(
        spark,
        [
            ("urn:a", OWL_SAMEAS, iri("urn:b")),
            ("urn:b", OWL_DIFFERENT_FROM, iri("urn:a")),    # reversed orientation
            ("urn:c", OWL_SAMEAS, iri("urn:d")),            # fine
            ("urn:nil", RDF_TYPE, iri(OWL_NOTHING)),        # cls-nothing2
        ],
    )
    got = _clashes(consistency_report(t))
    assert ("urn:a", "eq-diff1", "urn:b") in got
    assert ("urn:nil", "cls-nothing2", OWL_NOTHING) in got
    assert not any(n in ("urn:c", "urn:d") for n, _r, _d in got)


def test_consistency_clean_graph_empty(spark):
    from cmem_plugin_pyshacl_spark.plans.inference import consistency_report

    t = triples_from_rows(
        spark,
        [
            ("urn:a", EX + "knows", iri("urn:b")),
            ("urn:a", RDF_TYPE, iri(EX + "Person")),
        ],
    )
    assert consistency_report(t).count() == 0


def test_consistency_max_cardinality_zero(spark):
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL,
        OWL_MAX_CARD,
        OWL_MAX_QCARD,
        OWL_ON_CLASS,
        OWL_ON_PROPERTY,
        consistency_report,
    )

    t = triples_from_rows(
        spark,
        [
            # R: maxCardinality 0 on ex:child
            ("urn:R", OWL_MAX_CARD, lit_typed("0")),
            ("urn:R", OWL_ON_PROPERTY, iri(EX + "child")),
            # Q: maxQualifiedCardinality 0 on ex:pet qualified to ex:Cat
            ("urn:Q", OWL_MAX_QCARD, lit_typed("0")),
            ("urn:Q", OWL_ON_PROPERTY, iri(EX + "pet")),
            ("urn:Q", OWL_ON_CLASS, iri(EX + "Cat")),
            # T: qualified to owl:Thing -> behaves like unqualified
            ("urn:T", OWL_MAX_QCARD, lit_typed("0")),
            ("urn:T", OWL_ON_PROPERTY, iri(EX + "toy")),
            ("urn:T", OWL_ON_CLASS, iri(OWL + "Thing")),
            ("urn:a", RDF_TYPE, iri("urn:R")),
            ("urn:a", EX + "child", iri("urn:kid")),      # cls-maxc1
            ("urn:b", RDF_TYPE, iri("urn:R")),            # no child: fine
            ("urn:c", RDF_TYPE, iri("urn:Q")),
            ("urn:c", EX + "pet", iri("urn:felix")),
            ("urn:felix", RDF_TYPE, iri(EX + "Cat")),     # cls-maxqc2
            ("urn:d", RDF_TYPE, iri("urn:Q")),
            ("urn:d", EX + "pet", iri("urn:rex")),        # rex not a Cat: fine
            ("urn:e", RDF_TYPE, iri("urn:T")),
            ("urn:e", EX + "toy", lit_typed("ball")),     # cls-maxc1 (Thing)
        ],
    )
    got = _clashes(consistency_report(t))
    assert ("urn:a", "cls-maxc1", EX + "child") in got
    assert ("urn:c", "cls-maxqc2", EX + "pet") in got
    assert ("urn:e", "cls-maxc1", EX + "toy") in got
    assert not any(n in ("urn:b", "urn:d") for n, _r, _d in got)


def test_consistency_negative_property_assertions(spark):
    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_ASSERTION_PROP,
        OWL_SRC_INDIVIDUAL,
        OWL_TGT_INDIVIDUAL,
        OWL_TGT_VALUE,
        consistency_report,
    )

    t = triples_from_rows(
        spark,
        [
            ("urn:npa1", OWL_SRC_INDIVIDUAL, iri("urn:a")),
            ("urn:npa1", OWL_ASSERTION_PROP, iri(EX + "knows")),
            ("urn:npa1", OWL_TGT_INDIVIDUAL, iri("urn:b")),
            ("urn:a", EX + "knows", iri("urn:b")),          # prp-npa1
            ("urn:a", EX + "knows", iri("urn:c")),          # fine
            ("urn:npa2", OWL_SRC_INDIVIDUAL, iri("urn:d")),
            ("urn:npa2", OWL_ASSERTION_PROP, iri(EX + "age")),
            ("urn:npa2", OWL_TGT_VALUE, lit_typed("5", XSD_INTEGER)),
            ("urn:d", EX + "age", lit_typed("5", XSD_INTEGER)),  # prp-npa2
            # same lexical form, different datatype -> NOT a clash
            ("urn:e", EX + "age", lit_typed("5")),
            ("urn:npa3", OWL_SRC_INDIVIDUAL, iri("urn:e")),
            ("urn:npa3", OWL_ASSERTION_PROP, iri(EX + "age")),
            ("urn:npa3", OWL_TGT_VALUE, lit_typed("5", XSD_INTEGER)),
        ],
    )
    got = _clashes(consistency_report(t))
    assert ("urn:a", "prp-npa1", EX + "knows") in got
    assert ("urn:d", "prp-npa2", EX + "age") in got
    assert not any(n == "urn:e" for n, _r, _d in got)


def test_consistency_npa_bulk_no_driver_collect(spark, monkeypatch):
    """NPA reifications are instance-scale ASSERTIONS, not schema: with
    100k of them, consistency_report must never collect them to the
    driver (join-based prp-npa plan) while still finding the planted
    clashes. A spy on DataFrame.collect bounds every internal collect."""
    from pyspark.sql import DataFrame as _DF

    from cmem_plugin_pyshacl_spark.plans.inference import (
        OWL_ASSERTION_PROP,
        OWL_SRC_INDIVIDUAL,
        OWL_TGT_INDIVIDUAL,
        consistency_report,
    )

    n = 100_000
    base = spark.range(n).selectExpr(
        "concat('urn:npa:', id) AS npa",
        "concat('urn:s:', id) AS src",
        "concat('urn:o:', id) AS tgt",
        "CAST(id % 16 AS INT) AS part",
    )
    nulls = (
        "CAST(NULL AS STRING) AS o_datatype, CAST(NULL AS STRING) AS o_lang,"
        " CAST(NULL AS STRING) AS graph"
    )

    def reif(pred: str, o_expr: str):
        return base.selectExpr(
            "npa AS s",
            f"'{pred}' AS p",
            "'iri' AS o_kind",
            f"{o_expr} AS o_value",
            *nulls.split(","),
            "part AS part_id",
        )

    knows = "http://example.org/knows"
    t = (
        reif(OWL_SRC_INDIVIDUAL, "src")
        .unionByName(reif(OWL_ASSERTION_PROP, f"'{knows}'"))
        .unionByName(reif(OWL_TGT_INDIVIDUAL, "tgt"))
        .unionByName(
            # three edges that violate their NPAs; the rest of the graph
            # has no matching assertions
            spark.range(3).selectExpr(
                "concat('urn:s:', id) AS s",
                f"'{knows}' AS p",
                "'iri' AS o_kind",
                "concat('urn:o:', id) AS o_value",
                *nulls.split(","),
                "CAST(id AS INT) AS part_id",
            )
        )
    )

    sizes: list[int] = []
    orig = _DF.collect

    def spy(self):
        out = orig(self)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(_DF, "collect", spy)
    got = {(r.node, r.rule) for r in consistency_report(t).collect()}
    assert got == {(f"urn:s:{i}", "prp-npa1") for i in range(3)}
    # every driver-side collect stayed schema-sized (the 100k reification
    # rows and the final 3-row report are the only data-scale frames)
    internal = sizes[:-1]
    assert all(s <= 1000 for s in internal), internal


def test_dt_type1_datatype_declarations(spark):
    """inference='owlrl' declares every OWL-RL-supported datatype that
    appears in the graph as rdf:type rdfs:Datatype (dt-type1, round-5
    VERDICT #7); unsupported datatypes and the rdfs profile add nothing."""
    from pyspark.sql import functions as F

    from cmem_plugin_pyshacl_spark.plans.inference import (
        RDFS_DATATYPE,
        apply_inference,
    )

    xsd = "http://www.w3.org/2001/XMLSchema#"
    data = triples_from_rows(
        spark,
        [
            ("urn:a", EX + "age", lit_typed("42", xsd + "integer")),
            ("urn:a", EX + "name", lit_typed("x", xsd + "string")),
            ("urn:a", EX + "odd", lit_typed("y", EX + "customType")),
        ],
    )
    inf = apply_inference(data, profile="owlrl")
    got = {
        r.s
        for r in inf.filter(
            (F.col("p") == RDF_TYPE) & (F.col("o_value") == RDFS_DATATYPE)
        ).collect()
    }
    # supported datatypes declared; the custom datatype is not
    assert got == {xsd + "integer", xsd + "string"}
    # the rdfs profile leaves datatype axioms alone
    rdfs_only = apply_inference(data, profile="rdfs")
    assert (
        rdfs_only.filter(F.col("o_value") == RDFS_DATATYPE).count() == 0
    )
