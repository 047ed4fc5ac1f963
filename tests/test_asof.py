"""asof_join semantics: <= tie matching, nulls before any right row, and
payload-struct integrity when a payload field is legitimately null."""

from web_scraper_spark.operators.asof import asof_join


def test_ties_nulls_and_payload_integrity(spark):
    left = spark.createDataFrame(
        [(1, "k", 5), (2, "k", 10), (3, "k", 15), (4, "z", 7)],
        "event_id long, k string, t long",
    )
    right = spark.createDataFrame(
        [
            ("k", 10, 100, "a"),     # t=10: matches event at exactly t=10 (<=)
            ("k", 12, 200, None),    # null payload FIELD must ride with its row
            ("k", 14, 300, "c"),
        ],
        "k string, t long, rid long, tag string",
    )
    out = {
        r.event_id: (r.rid, r.tag)
        for r in asof_join(
            left, right, key="k", left_time="t", right_time="t",
            payload=["rid", "tag"],
        ).collect()
    }
    assert out[1] == (None, None)    # nothing precedes t=5
    assert out[2] == (100, "a")      # equal timestamp matches
    assert out[3] == (300, "c")      # latest preceding, skipping none
    assert out[4] == (None, None)    # key with no right rows at all

    # the null tag at t=12 must NOT be back-filled from t=10's "a":
    # an event between 12 and 14 sees (200, None) as one consistent row
    probe = spark.createDataFrame([(9, "k", 13)], "event_id long, k string, t long")
    row = asof_join(
        probe, right, key="k", left_time="t", right_time="t",
        payload=["rid", "tag"],
    ).collect()[0]
    assert (row.rid, row.tag) == (200, None)


def test_asof_matches_python_mirror_fuzz(spark):
    """Randomized (key, time) layouts vs a direct python scan — catches
    window/tie/ordering bugs the hand fixture can't enumerate."""
    import random

    rng = random.Random(11)
    for trial in range(12):
        keys = ["a", "b", "c"]
        left_rows = [
            (i, rng.choice(keys), rng.randrange(0, 25))
            for i in range(rng.randrange(1, 14))
        ]
        seen = set()
        right_rows = []
        for j in range(rng.randrange(0, 14)):
            k, t = rng.choice(keys), rng.randrange(0, 25)
            if (k, t) in seen:  # precondition: unique per (key, time)
                continue
            seen.add((k, t))
            right_rows.append((k, t, 1000 + j))
        left = spark.createDataFrame(left_rows, "event_id long, k string, t long")
        right = spark.createDataFrame(
            right_rows or [("zz", -1, -1)], "k string, t long, rid long"
        )
        got = {
            r.event_id: r.rid
            for r in asof_join(
                left, right, key="k", left_time="t", right_time="t",
                payload=["rid"],
            ).collect()
        }
        for eid, k, t in left_rows:
            prior = [(rt, rid) for (rk, rt, rid) in right_rows if rk == k and rt <= t]
            want = max(prior)[1] if prior else None
            assert got[eid] == want, (trial, eid, k, t, got[eid], want)
