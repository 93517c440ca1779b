"""Round-10 additions: bag-semantics set ops, shingle novelty, and the
embedding contamination audit — toy-fixture goldens for each new query.
"""

from __future__ import annotations

import datetime as dt

from ecommerce_data_pipeline_spark.queries import QUERIES


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 3, 1, 12, minute)


def _event(eid, minute, uid, etype):
    return (eid, _ts(minute), uid, etype, 1.0, "{}")


def test_bag_set_ops_multiplicity(spark, sf_dir_factory):
    # user 1, one day: 3 views vs 1 purchase -> EXCEPT ALL keeps 2 copies,
    # INTERSECT ALL keeps 1 (set semantics would say 0 and 1).
    # user 2: 1 view, 2 purchases -> 0 unconverted, 1 converted.
    # user 3: 2 views, no purchase -> 2 unconverted, 0 converted.
    sf = sf_dir_factory(
        events=[
            _event(1, 0, 1, "view"),
            _event(2, 1, 1, "view"),
            _event(3, 2, 1, "view"),
            _event(4, 3, 1, "purchase"),
            _event(5, 0, 2, "view"),
            _event(6, 1, 2, "purchase"),
            _event(7, 2, 2, "purchase"),
            _event(8, 0, 3, "view"),
            _event(9, 1, 3, "view"),
        ]
    )
    rows = {
        r["user_id"]: (r["unconverted_views"], r["converted_views"])
        for r in QUERIES["bag_set_ops"](spark, sf).collect()
    }
    assert rows == {1: (2, 1), 2: (0, 1), 3: (2, 0)}


def test_bag_set_ops_day_boundary(spark, sf_dir_factory):
    # A purchase on a DIFFERENT day must not absorb a view token: the bag
    # element is (user, day), not user.
    sf = sf_dir_factory(
        events=[
            (1, dt.datetime(2024, 3, 1, 23, 59), 7, "view", 1.0, "{}"),
            (2, dt.datetime(2024, 3, 2, 0, 1), 7, "purchase", 1.0, "{}"),
        ]
    )
    rows = QUERIES["bag_set_ops"](spark, sf).collect()
    assert {(r["user_id"], r["unconverted_views"], r["converted_views"]) for r in rows} == {
        (7, 1, 0)
    }


def test_shingle_novelty_first_owner(spark, sf_dir_factory):
    # doc 1 (source a) introduces every shingle of TEXT; doc 2 (source b)
    # is an exact copy, so source b introduces nothing; doc 3 (source b)
    # is disjoint content and introduces all of its own shingles.
    text = "abcdefghijklmnop"  # 16 chars -> 5 distinct 12-shingles
    other = "zyxwvutsrqponmlk"
    sf = sf_dir_factory(
        documents=[
            (1, text, "en", "a", len(text)),
            (2, text, "en", "b", len(text)),
            (3, other, "en", "b", len(other)),
        ]
    )
    rows = {
        r["source"]: (
            r["shingle_occurrences"],
            r["novel_shingles"],
            r["novelty_rate"],
        )
        for r in QUERIES["shingle_novelty_curve"](spark, sf).collect()
    }
    assert rows["a"] == (5, 5, 1.0)
    # source b: 10 occurrences (5 copied + 5 fresh), only the fresh 5 novel
    assert rows["b"] == (10, 5, 0.5)


def test_eval_contamination_flags_near_dup_train_vector(spark, sf_dir_factory):
    # vec 0 is the eval probe (0 % 20 == 0); vec 1 duplicates it (cosine
    # 1.0 -> contaminated), vec 2 is orthogonal. Nearest train id must be
    # the duplicate, not the orthogonal vector.
    sf = sf_dir_factory(
        embeddings=[
            (0, [1.0, 0.0, 0.0, 0.0], 0),
            (1, [1.0, 0.0, 0.0, 0.0], 1),
            (2, [0.0, 1.0, 0.0, 0.0], 2),
        ]
    )
    rows = QUERIES["eval_contamination_embedding"](spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["eval_id"], r["nearest_train_id"]) == (0, 1)
    assert r["max_cosine"] == 1.0 and r["contaminated"] is True


def test_eval_contamination_below_threshold(spark, sf_dir_factory):
    sf = sf_dir_factory(
        embeddings=[
            (0, [1.0, 0.0, 0.0, 0.0], 0),
            (1, [0.1, 1.0, 0.0, 0.0], 1),
        ]
    )
    r = QUERIES["eval_contamination_embedding"](spark, sf).collect()[0]
    assert r["contaminated"] is False and r["nearest_train_id"] == 1


def test_revenue_trend_accumulates_in_decimal():
    # ADVICE r9: the OLS sufficient statistics must accumulate AS
    # decimal(38,0), not sum in int64 and cast after — assert the plan's
    # aggregate expressions carry decimal sums for sxx/sxy.
    import inspect

    from ecommerce_data_pipeline_spark.queries import analytics

    src = inspect.getsource(analytics.q_revenue_trend_by_type)
    assert 'F.sum(F.col("x").cast(dec) * F.col("x").cast(dec))' in src
    assert 'F.sum(F.col("x").cast(dec) * F.col("y").cast(dec))' in src
