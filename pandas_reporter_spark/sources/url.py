"""censusreporter: URL scheme (S1) + HTTP fetch-with-cache (S2).

Recovered contract (reference censusreporter.py:19-103, test pins
test_url.py:17-34):

- `censusreporter:<table_id>/<summary_level>/<geoid>` with optional
  `/` or `//` after the scheme and an optional trailing slash — all
  four spellings parse to the same three parts.
- Anything other than exactly three non-empty path components is a
  format error.
- cache key `api.censusreporter.org/1.0/<table>/<sl>/<geoid>.json`;
  resource URL hits /data/show/latest with table_ids + geo_ids.
"""

from __future__ import annotations

import json
import os
import urllib.request
from typing import Callable, Optional

API_HOST = "api.censusreporter.org/1.0"


class URLError(ValueError):
    """Malformed censusreporter: URL (reference AppUrlError analog)."""


class CensusReporterURL:
    """Parser/locator for censusreporter: table URLs."""

    def __init__(self, url: str):
        self.url = url
        scheme, sep, rest = url.partition(":")
        if not sep or not scheme.startswith("censusreporter"):
            raise URLError(f"not a censusreporter URL: {url!r}")
        if rest.startswith("//"):
            rest = rest[2:]
        parts = [p for p in rest.strip("/").split("/")]
        if len(parts) != 3 or not all(parts):
            raise URLError(
                f"Census reporter URLs must have three path components. Got: {parts!r}"
            )
        self.table_id, self.summary_level, self.geoid = parts

    def __str__(self) -> str:
        return f"censusreporter:{self.table_id}/{self.summary_level}/{self.geoid}"

    @property
    def cache_key(self) -> str:
        return (
            f"{API_HOST}/{self.table_id}/{self.summary_level}/{self.geoid}.json"
        )

    @property
    def resource_url(self) -> str:
        return (
            f"http://{API_HOST}/data/show/latest"
            f"?table_ids={self.table_id}"
            f"&geo_ids={self.summary_level}|{self.geoid}"
        )


def fetch_json(
    url: CensusReporterURL,
    cache_dir: Optional[str] = None,
    fetcher: Optional[Callable[[str], dict]] = None,
) -> dict:
    """Cache-first JSON fetch (S2).

    Cache layout mirrors the reference's (`<cache>/<cache_key>`); on a
    miss the injectable `fetcher` (tests: fixture loader; default:
    stdlib urllib GET) fills it. The driver environment has no network,
    so every driver-visible path goes through a committed fixture.
    """
    path = os.path.join(cache_dir, url.cache_key) if cache_dir else None
    if path and os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    if fetcher is None:
        def fetcher(u: str) -> dict:  # pragma: no cover - network
            with urllib.request.urlopen(u) as r:
                return json.loads(r.read().decode())
    data = fetcher(url.resource_url)
    if path:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(data, f, indent=4)
    return data
