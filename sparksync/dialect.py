"""Target-dialect knobs for the MySQL-family flavors the reference
supports (readme.md:10: MySQL, PolarDB, Percona Server, MariaDB,
OceanBase, TiDB, GaussDB for MySQL).

The reference treats them all as one MySQL wire target; operationally
they differ in default port, JDBC URL parameters and which post-data
object classes they accept — exactly the knobs a sync job needs.
Capability notes reflect each vendor's public documentation.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Dialect:
    name: str
    default_port: int = 3306
    url_params: str = "rewriteBatchedStatements=true&useSSL=false"
    #: TiDB historically parses FK DDL but does not enforce it (GA
    #: enforcement only from v7.5); a sync job should not pretend the
    #: constraint exists on targets that ignore it.
    supports_fk: bool = True
    supports_fk_cascade: bool = True
    #: MODIFY ... AUTO_INCREMENT after load; TiDB restricts changing a
    #: column to AUTO_INCREMENT (docs: unsupported DDL change), so the
    #: sequence-trigger rewrite is skipped there.
    supports_autoinc_rewrite: bool = True
    #: which ddl.py rendering arm the sync phases pass to the builders:
    #: "mysql" (backticks, MySQL types) for the whole MySQL family,
    #: "ansi" (standard quoting/types) for ANSI engines — the arm the
    #: in-container Derby live-exec e2e drives end-to-end.
    ddl_dialect: str = "mysql"


DIALECTS: dict[str, Dialect] = {
    "mysql": Dialect("mysql"),
    "percona": Dialect("percona"),
    "polardb": Dialect("polardb"),
    "mariadb": Dialect("mariadb"),
    "oceanbase": Dialect("oceanbase", default_port=2881),
    "tidb": Dialect(
        "tidb",
        default_port=4000,
        supports_fk=False,
        supports_fk_cascade=False,
        supports_autoinc_rewrite=False,
    ),
    "gaussdb": Dialect("gaussdb"),
    # ANSI/Derby target: the dialect the live JDBC e2e executes against
    # (embedded Derby ships in Spark's JVM). Identity must be folded at
    # CREATE time there, so the post-load autoinc rewrite is off.
    "ansi": Dialect(
        "ansi",
        default_port=1527,
        url_params="",
        supports_autoinc_rewrite=False,
        ddl_dialect="ansi",
    ),
}


def get_dialect(name: str | None) -> Dialect:
    if not name:
        return DIALECTS["mysql"]
    key = name.strip().lower()
    if key not in DIALECTS:
        raise ValueError(
            f"unknown target flavor {name!r}; known: {sorted(DIALECTS)}"
        )
    return DIALECTS[key]
