"""Public-suffix (TLD) extraction — the one sanctioned pandas UDF.

The reference carries a 10k-line generated public-suffix map and a
longest-suffix matcher (tldparserr/tld_parser.go:5-46). A suffix map
lookup is pure dictionary work that column expressions can't express
cleanly for variable-depth suffixes, so this is Arrow-batched pandas —
vectorized transfer, dict lookups in C-backed pandas ops.

The engine calls it only on the *first* DNS PTR record of rows that have
one (helpers/helpers.go:491-505), i.e. a small fraction of the fact
table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .psl import parse_psl_domain


def _parse_one(fqdn) -> str:
    if not isinstance(fqdn, str):
        return "none"
    return parse_psl_domain(fqdn)


# NOTE: returnType must be a DataType instance, not a DDL string — a DDL
# string is parsed via the active SparkContext, which doesn't exist when
# the executor's Python worker re-imports this module to unpickle the UDF.
@F.pandas_udf(T.StringType())
def tld_of(domains: pd.Series) -> pd.Series:
    return domains.map(_parse_one)
