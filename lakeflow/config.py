"""Environment-only configuration (SURVEY Phase 0).

The reference hardcoded live credentials in source
(`utils/redshift_sa_conn.py:66-79`, `s3_to_silver.py:87-90` — see
SURVEY security note) and kept named connection "profiles" as code.
Here a profile is a set of environment variables; nothing secret ever
appears in code or logs.

Profile NAME maps to variables LAKEFLOW_<NAME>_URL / _USER / _PASSWORD
(plus optional _DRIVER). Example:

    export LAKEFLOW_WAREHOUSE_URL=jdbc:postgresql://host:5439/db
    export LAKEFLOW_WAREHOUSE_USER=etl
    export LAKEFLOW_WAREHOUSE_PASSWORD=...
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class ConnectionProfile:
    name: str
    url: str
    user: str | None
    password: str | None
    driver: str | None

    def jdbc_properties(self) -> dict[str, str]:
        props: dict[str, str] = {}
        if self.user:
            props["user"] = self.user
        if self.password:
            props["password"] = self.password
        if self.driver:
            props["driver"] = self.driver
        return props

    def __repr__(self) -> str:  # never leak the password into logs
        return f"ConnectionProfile(name={self.name!r}, url={self.url!r}, user={self.user!r}, password=***)"


def connection_profile(name: str) -> ConnectionProfile:
    prefix = f"LAKEFLOW_{name.upper()}"
    url = os.environ.get(f"{prefix}_URL")
    if not url:
        raise KeyError(
            f"connection profile '{name}' not configured: set {prefix}_URL "
            f"(and optionally {prefix}_USER/_PASSWORD/_DRIVER)"
        )
    return ConnectionProfile(
        name=name,
        url=url,
        user=os.environ.get(f"{prefix}_USER"),
        password=os.environ.get(f"{prefix}_PASSWORD"),
        driver=os.environ.get(f"{prefix}_DRIVER"),
    )
