"""Property-based parity: random inputs through the Spark expressions vs
the oracle's plain-Python mirrors (hypothesis). One Spark job per
property — inputs are generated up front and batched."""

import string

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from web_scraper_spark.functions import (
    canonicalize_url,
    domain_from_url,
    normalize_company_name,
    normalize_phone_e164,
    prepare_url,
)
from web_scraper_spark.oracle import simulator as oracle

_HOST_CHARS = string.ascii_letters + string.digits + ".-"
_NAME_ALPHABET = string.ascii_letters + string.digits + " .,&'-éüñ"

host_st = st.text(alphabet=_HOST_CHARS, min_size=1, max_size=24)
path_st = st.text(
    alphabet=string.ascii_lowercase + string.digits + "/-_.?#=&", max_size=24
)
scheme_st = st.sampled_from(["", "http://", "https://", "ftp://", "HTTPS://"])
url_st = st.builds(lambda s, h, p: f"{s}{h}/{p}", scheme_st, host_st, path_st)
pad_st = st.sampled_from(["", " ", "  ", "\t"])


def _run_batch(spark, values, expr_builder):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r.out for r in df.select(expr_builder(F.col("v")).alias("out")).collect()]


@settings(max_examples=5, deadline=None)
@given(st.data())
def test_url_functions_property(spark, data):
    values = data.draw(
        st.lists(
            st.builds(lambda p, u: p + u, pad_st, url_st), min_size=80, max_size=80
        )
    )
    prep = _run_batch(spark, values, prepare_url)
    for v, got in zip(values, prep):
        assert got == oracle.prepare_url(v), repr(v)

    prepared = [oracle.prepare_url(v) for v in values]
    dom = _run_batch(spark, prepared, domain_from_url)
    for v, got in zip(prepared, dom):
        assert got == oracle.get_domain_from_url(v), repr(v)

    canon = _run_batch(spark, prepared, canonicalize_url)
    for v, got in zip(prepared, canon):
        exp = oracle.canonicalize(v)
        assert got == exp, repr(v)


@settings(max_examples=5, deadline=None)
@given(st.data())
def test_name_normalization_property(spark, data):
    values = data.draw(
        st.lists(
            st.text(alphabet=_NAME_ALPHABET, max_size=40), min_size=80, max_size=80
        )
    )
    got = _run_batch(spark, values, normalize_company_name)
    for v, g in zip(values, got):
        assert g == oracle.normalize_company_name(v), repr(v)


@settings(max_examples=5, deadline=None)
@given(st.data())
def test_phone_property(spark, data):
    digit_groups = st.lists(
        st.integers(min_value=0, max_value=999), min_size=2, max_size=5
    )
    sep = st.sampled_from(["-", ".", " ", ""])
    prefix = st.sampled_from(["", "+1 ", "1-", "+44 ", "("])
    values = data.draw(
        st.lists(
            st.builds(
                lambda p, gs, s: p + s.join(str(g) for g in gs),
                prefix, digit_groups, sep,
            ),
            min_size=80, max_size=80,
        )
    )
    got = _run_batch(spark, values, normalize_phone_e164)
    for v, g in zip(values, got):
        assert g == oracle.normalize_phone_number(v), repr(v)
