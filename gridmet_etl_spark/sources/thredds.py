"""Source-freshness gate (SURVEY §2.1 S9, §2.10 T1).

Reference: ``Gridmet_current.py`` polls each THREDDS dataset's
``dataset.xml`` and compares ``gridDataset.TimeSpan.end`` against
"yesterday" in UTC-7, exiting non-zero when any dataset is stale
(Gridmet_current.py:24-48).

Engine version: pure function over an injectable fetcher (no network in
tests; the default fetcher uses urllib). Driver-side — this gates a batch
run, it is not a Spark scan.
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import datetime, timedelta, timezone

GRIDMET_AGGREGATES = [
    "agg_met_tmmn_1979_CurrentYear_CONUS.nc",
    "agg_met_tmmx_1979_CurrentYear_CONUS.nc",
    "agg_met_pr_1979_CurrentYear_CONUS.nc",
    "agg_met_rmin_1979_CurrentYear_CONUS.nc",
    "agg_met_rmax_1979_CurrentYear_CONUS.nc",
]  # Gridmet_current.py:26-28 URL naming


def parse_timespan_end(xml_text: str) -> datetime:
    """Extract <end> of the gridDataset TimeSpan from a THREDDS dataset.xml
    (F9 analogue, without xmltodict: stdlib ElementTree)."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml_text)
    # namespace-agnostic search for TimeSpan/end
    for el in root.iter():
        if el.tag.endswith("TimeSpan"):
            for child in el:
                if child.tag.endswith("end"):
                    return datetime.strptime(child.text.strip()[:10], "%Y-%m-%d")
    raise ValueError("no TimeSpan/end element found")


def _default_fetch(url: str) -> str:
    import urllib.request

    with urllib.request.urlopen(url, timeout=30) as r:  # pragma: no cover
        return r.read().decode()


def check_freshness(
    base_url: str,
    datasets: list[str] | None = None,
    fetch: Callable[[str], str] | None = None,
    now: datetime | None = None,
) -> dict[str, bool]:
    """Return {dataset: is_fresh}; fresh ⇔ TimeSpan.end >= yesterday in
    UTC-7 (Gridmet_current.py:32-35, 43)."""
    fetch = fetch or _default_fetch
    datasets = datasets or GRIDMET_AGGREGATES
    now = now or datetime.now(timezone.utc)
    yesterday = (now - timedelta(hours=7)).date() - timedelta(days=1)
    out = {}
    for ds in datasets:
        xml_text = fetch(f"{base_url}/{ds}/dataset.xml")
        end = parse_timespan_end(xml_text).date()
        out[ds] = end >= yesterday
    return out
