"""Citation generator (S13) — reference censusreporter.py:286-319.

Pure metadata: BibTeX-ish dict for a censusreporter-sourced table;
False for anything else (the reference's contract, including the
swallow-and-return-False on malformed inputs).
"""

from __future__ import annotations

from datetime import date

from pandas_reporter_spark.sources.url import CensusReporterURL, URLError


def make_citation_dict(t) -> dict | bool:
    """`t` needs .url/.name/.description (the reference's term object).

    Returns the same key set the reference emits; year/title text pin
    the ACS 2010-2015 release the reference hardcodes.
    """
    try:
        url = getattr(t, "resolved_url", None) or t.url
        CensusReporterURL(str(t.url))  # raises unless censusreporter:
        table = str(t.name).split("_", 1)[0]
        return {
            "type": "dataset",
            "name": t.name,
            "origin": "United States Census Bureau",
            "publisher": "CensusReporter.org",
            "title": "2010 - 2015 American Community Survey, Table {}: {}".format(
                table, t.description
            ),
            "year": 2015,
            "accessDate": date.today().strftime("%Y-%m-%d"),
            "url": str(url),
        }
    except (AttributeError, KeyError, URLError):
        return False
