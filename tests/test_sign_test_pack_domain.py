"""Pin the l_quantity / l_linenumber domains the sign_test pack relies on.

contract_ext20.q_sign_test packs the lexicographic (linenumber, quantity)
order into ONE BIGINT — ``ln*100000 + round(q*100)`` — so the min/max runs
in a mutable LONG buffer (HashAggregate with map-side partials) instead of
an immutable struct buffer (SortAggregate of all of lineitem). The pack is
duplicated identically in the DuckDB oracle, so the oracle check CANNOT
detect a pack-range bug: if l_quantity ever left [0, 999.99] or went
negative, ordering would corrupt silently on BOTH engines at once
(ADVICE r11 item 2). This test pins the generator's domain directly:

- 0 <= l_quantity <= 999.99 (cents term stays in [0, 99999] — no carry
  into the linenumber digits),
- l_quantity is exact at 2 decimals (round-trips through cents), so
  cents compare identically to quantities,
- l_linenumber >= 0 (a negative linenumber would flip the pack's sign).

Checked at every generated scale factor with DuckDB (sub-second scans);
a future testdata-generator change that breaks any assumption fails here
before it can silently corrupt both engines.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_lineitem_domain_supports_packed_order(sf_dir):
    path = os.path.join(sf_dir, "lineitem.parquet")
    if not os.path.exists(path):
        pytest.skip(f"no lineitem at {sf_dir}")
    row = duckdb.sql(
        f"""
        SELECT min(l_quantity), max(l_quantity),
               max(abs(l_quantity * 100 - round(l_quantity * 100))),
               min(l_linenumber), count(*)
        FROM read_parquet('{path}')
        """
    ).fetchone()
    qmin, qmax, max_cent_err, lnmin, n = row
    assert n > 0
    assert qmin >= 0, f"negative l_quantity {qmin} breaks the pack sign"
    assert qmax <= 999.99, f"l_quantity {qmax} >= 1000 carries into ln digits"
    assert max_cent_err < 1e-6, (
        f"l_quantity not exact at 2 decimals (err {max_cent_err}): cents no "
        "longer compare identically to quantities"
    )
    assert lnmin >= 0, f"negative l_linenumber {lnmin} breaks the pack sign"
