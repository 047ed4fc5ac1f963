"""Unit tests for the live fetcher's per-host pacing logic (SURVEY.md H3
graft: politeness delays inside the fetch partition) — pure logic, no
network."""

import pandas as pd

from web_scraper_spark.sources.fetch import _pace_batch


def test_no_delays_preserves_order():
    batch = pd.DataFrame({"url": ["u1", "u2", "u3"], "host": ["a", "b", "a"]})
    order = _pace_batch(batch, {})
    assert [idx for _, idx in order] == [0, 1, 2]
    assert len({when for when, _ in order}) == 1  # all immediate


def test_per_host_delay_spaces_same_host():
    batch = pd.DataFrame(
        {"url": ["u1", "u2", "u3", "u4"], "host": ["a", "a", "b", "a"]}
    )
    order = _pace_batch(batch, {"a": 1.0})
    when = {idx: w for w, idx in order}
    base = min(when.values())
    # host a: slots at base, base+1, base+2; host b immediate
    assert abs(when[0] - base) < 1e-9
    assert abs(when[1] - (base + 1.0)) < 1e-9
    assert abs(when[3] - (base + 2.0)) < 1e-9
    assert abs(when[2] - base) < 1e-9


def test_sorted_by_deadline():
    batch = pd.DataFrame(
        {"url": ["u1", "u2", "u3"], "host": ["a", "a", "b"]}
    )
    order = _pace_batch(batch, {"a": 0.5})
    whens = [w for w, _ in order]
    assert whens == sorted(whens)
