"""Property-based equivalence (hypothesis): random member values and
page sizes, Spark engine vs the sequential reference oracle, and the
trie's two physical strategies (walk vs salted cascade) against each
other. Alphabet deliberately stresses the normalizer (unicode,
combining marks, '#', separators), empties, and multi-word splits —
the class of inputs the ADVICE r3 salt-capped-threshold boundary bug
lived in (small page_size × small salt_buckets × small groups), which
this suite would have caught.

Each example is a full Spark job, so example counts are small and each
example packs 10-40 members; the point is adversarial input SHAPES, not
volume (the SF-scale checks live in check_parity and the engine tests).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bucketizers_spark.oracle import SubjectPageOracle, SubstringOracle
from bucketizers_spark.operators import subject_page, substring_trie

# unicode-heavy alphabet: ascii, digits, separators the normalizer
# rewrites ('#', ',', "'"), NFKD-decomposable letters, a bare combining
# mark, and spaces (multi-word '+' joins)
_ALPHA = "abcz019 #,'-ñéØ̃J "

_values = st.lists(
    st.one_of(st.text(_ALPHA, max_size=10), st.none()),
    min_size=10,
    max_size=40,
)

_SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _members_df(spark, values):
    rows = [(i, f"m{i}", v) for i, v in enumerate(values)]
    return spark.createDataFrame(
        rows, "seq long, member_id string, value string"
    )


def _collect(df):
    out = {}
    for r in df.select("member_id", "bucket_id").collect():
        out.setdefault(r.member_id, [])
        if r.bucket_id is not None:
            out[r.member_id].append(r.bucket_id)
    return {k: sorted(v) for k, v in out.items()}


def _oracle_assignments(oracle, values):
    out, rels = {}, []
    for i, v in enumerate(values):
        res = oracle.bucketize([v] if v is not None else None, f"m{i}")
        out[f"m{i}"] = sorted(res.buckets)
        rels.extend(res.relations)
    return out, rels


def _rel_set(df):
    return {
        (r.from_bucket, r.relation_type, r.to_bucket, tuple(r["values"] or ()))
        for r in df.collect()
    }


def _oracle_rel_set(rels):
    return {
        (r.from_bucket, r.relation_type, r.to_bucket, tuple(r.values))
        for r in rels
    }


class TestSubstringProperty:
    """The two normalize tiers each tested in their contract domain
    (functions/normalize.py): ``ascii_fast=False`` (real NFKD) must be
    bit-exact on ANY input; ``ascii_fast=True`` (pure JVM, the 100 TB
    default) is bit-exact on ASCII-domain columns."""

    @_SET
    @given(values=_values, page_size=st.integers(1, 5))
    def test_nfkd_tier_matches_oracle_on_unicode(
        self, spark, values, page_size
    ):
        from bucketizers_spark.operators import fallback_pager

        df = _members_df(spark, values)
        matched = df.where(F.col("value").isNotNull())
        unmatched = df.where(F.col("value").isNull())
        res = substring_trie(
            matched, "value", page_size=page_size, ascii_fast=False
        )
        fb = fallback_pager(unmatched, page_size=page_size)
        got = _collect(res.assignments.unionByName(fb.assignments))
        exp, orels = _oracle_assignments(
            SubstringOracle(page_size=page_size), values
        )
        assert got == exp
        assert _rel_set(
            res.relations.unionByName(fb.relations)
        ) == _oracle_rel_set(orels)

    @_SET
    @given(
        values=st.lists(
            st.one_of(st.text("abz019 #,'-J", max_size=10), st.none()),
            min_size=10,
            max_size=40,
        ),
        page_size=st.integers(1, 5),
    )
    def test_ascii_tier_matches_oracle_via_front_door(
        self, spark, values, page_size
    ):
        """ASCII-domain inputs through route_with_fallback: the fast
        tier + the NULL→bucketless routing, against the oracle."""
        from bucketizers_spark.pipeline import route_with_fallback

        df = _members_df(spark, values)
        res = route_with_fallback(
            df,
            {
                "strategy": "substring",
                "column": "value",
                "page_size": page_size,
            },
        )
        exp, orels = _oracle_assignments(
            SubstringOracle(page_size=page_size), values
        )
        assert _collect(res.assignments) == exp
        assert _rel_set(res.relations) == _oracle_rel_set(orels)


class TestTrieStrategiesProperty:
    @_SET
    @given(
        values=st.lists(st.text(_ALPHA, max_size=8), min_size=8, max_size=30),
        page_size=st.integers(1, 4),
        salt=st.integers(2, 5),
        nparents=st.integers(1, 3),
    )
    def test_walk_equals_salted_cascade_per_parent(
        self, spark, values, page_size, salt, nparents
    ):
        """walk vs cascade with SMALL page_size × SMALL salt_buckets —
        the exact regime of the r3 salt-capped-threshold boundary."""
        from bucketizers_spark.operators.multi import trie_within_parent

        rows = [
            (i, f"p{i % nparents}", v) for i, v in enumerate(values)
        ]
        df = spark.createDataFrame(rows, "seq long, _parent string, value string")
        walk = trie_within_parent(
            df, "_parent", "value", page_size=page_size, strategy="walk"
        )
        casc = trie_within_parent(
            df,
            "_parent",
            "value",
            page_size=page_size,
            strategy="cascade",
            salt_buckets=salt,
        )
        wa = {(r.seq, r.bucket_id) for r in walk.assignments.collect()}
        ca = {(r.seq, r.bucket_id) for r in casc.assignments.collect()}
        assert wa == ca
        assert _rel_set(walk.relations) == _rel_set(casc.relations)


class TestSubjectProperty:
    @_SET
    @given(
        values=st.lists(
            st.one_of(st.text(_ALPHA, max_size=8), st.none()),
            min_size=10,
            max_size=40,
        ),
        max_relations=st.integers(1, 4),
    )
    def test_subject_matches_oracle(self, spark, values, max_relations):
        from bucketizers_spark.operators import fallback_pager

        df = _members_df(spark, values)
        matched = df.where(F.col("value").isNotNull())
        unmatched = df.where(F.col("value").isNull())
        res = subject_page(
            matched,
            "value",
            salt="s0",
            max_relations=max_relations,
            ascii_fast=False,  # unicode alphabet → the NFKD tier
        )
        fb = fallback_pager(unmatched)
        oracle = SubjectPageOracle(max_relations=max_relations, salt="s0")
        exp, orels = _oracle_assignments(oracle, values)
        assert _collect(res.assignments.unionByName(fb.assignments)) == exp
        assert _rel_set(
            res.relations.unionByName(fb.relations)
        ) == _oracle_rel_set(orels)
