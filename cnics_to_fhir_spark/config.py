"""Job/settings configuration — the reference's INI surface, parsed once.

Mirrors:
- job-config.ini ``[JobList] Job_N = "site1,site2:db_name:res1,res2"``
  parsed by sequential lookup + str.split (cnics_to_fhir.py:249-256);
- settings.ini resource filters — raw boolean-SQL fragments spliced into
  the generated queries (settings.ini:33-114, spliced cnics_to_fhir.py:123,
  :140, :156). The engine passes the same text to ``F.expr`` so Catalyst
  parses and pushes it down instead of string-splicing;
- the strip-quotes convention: every value read is ``.strip('"')``-ed
  (cnics_to_fhir.py:195, :220-222).
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass, field


@dataclass(frozen=True)
class JobSpec:
    sites: tuple[str, ...]
    db_name: str
    resources: tuple[str, ...]  # subset of {conditions, medicationrequests, observations}


@dataclass(frozen=True)
class Settings:
    pat_cnt: int = 100_000  # settings.ini:21, LIMIT at cnics_to_fhir.py:265
    conditions_filter_sql: str | None = None
    medications_filter_sql: str | None = None
    observations_filter_sql: str | None = None
    crosswalk_path: str | None = None  # settings.ini:31 (uw only)
    extra: dict[str, str] = field(default_factory=dict)


def _unquote(v: str) -> str:
    return v.strip().strip('"')


def parse_job_config(text: str) -> list[JobSpec]:
    """Job_1..Job_N until a gap, each ``sites:db:resources``."""
    cp = configparser.ConfigParser(interpolation=None)
    cp.read_string(text)
    jobs: list[JobSpec] = []
    n = 1
    while cp.has_option("JobList", f"Job_{n}"):
        raw = _unquote(cp.get("JobList", f"Job_{n}"))
        sites, db_name, resources = raw.split(":")
        jobs.append(
            JobSpec(
                sites=tuple(s.strip().lower() for s in sites.split(",") if s.strip()),
                db_name=db_name.strip(),
                resources=tuple(r.strip().lower() for r in resources.split(",") if r.strip()),
            )
        )
        n += 1
    return jobs


def parse_settings(text: str) -> Settings:
    cp = configparser.ConfigParser(interpolation=None)
    cp.read_string(text)

    def opt(section: str, key: str) -> str | None:
        if cp.has_option(section, key):
            return _unquote(cp.get(section, key))
        return None

    filters = "Filters" if cp.has_section("Filters") else "DEFAULT"
    return Settings(
        pat_cnt=int(opt("Main", "PatCnt") or 100_000),
        conditions_filter_sql=opt(filters, "ConditionsFilter"),
        medications_filter_sql=opt(filters, "MedicationsFilter"),
        observations_filter_sql=opt(filters, "ObservationsFilter"),
        crosswalk_path=opt("Main", "CrosswalkFile"),
        extra={
            k: _unquote(v)
            for section in cp.sections()
            for k, v in cp.items(section)
        },
    )
