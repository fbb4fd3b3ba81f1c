"""Job configuration.

Mirrors the reference's YAML surface (example.yml via viper,
/root/reference/cmd/root.go:536-571 and connect/connect.go:4-16):
src/dest connection strings, pageSize, maxParallel, batchRowSize,
exclude list, and the table-as-SQL map (-s mode, cmd/root.go:84-85).
Parsed with a tiny hand-rolled reader so we add no dependencies; the
subset of YAML we accept is flat `key: value` plus one-level maps,
which covers the reference's example.yml exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ConnInfo:
    """connect/connect.go:4-16 plus the target-flavor knob (the
    reference's readme lists 7 MySQL-family targets; dbType selects
    port/URL/DDL behavior via dialect.py)."""

    host: str = ""
    port: int = 0
    username: str = ""
    password: str = ""
    database: str = ""
    db_type: str = "mysql"

    def oracle_url(self) -> str:
        return f"jdbc:oracle:thin:@//{self.host}:{self.port}/{self.database}"

    def mysql_url(self) -> str:
        from .dialect import get_dialect

        d = get_dialect(self.db_type)
        port = self.port or d.default_port
        return f"jdbc:mysql://{self.host}:{port}/{self.database}?{d.url_params}"


@dataclass
class Config:
    src: ConnInfo = field(default_factory=ConnInfo)
    dest: ConnInfo = field(default_factory=ConnInfo)
    page_size: int = 100_000  # example.yml:13
    max_parallel: int = 100  # example.yml:14
    batch_row_size: int = 1000  # example.yml:15
    exclude: list[str] = field(default_factory=list)
    tables: dict[str, str] = field(default_factory=dict)  # table -> custom SQL

    @property
    def clamped_batch(self) -> int:
        """Kept for parity with the reference's 65535-placeholder clamp
        (cmd/root.go:376); Spark's executeBatch doesn't need it, but we
        never exceed it either."""
        return min(self.batch_row_size, 60_000)


def parse_simple_yaml(text: str) -> dict:
    """Flat YAML subset: `k: v`, one-level nested maps, `- item` lists —
    exactly the shape of the reference's example.yml. A key with no
    value stays *pending* until the next line reveals whether it holds a
    map (`k: v` children), a list (`- item` children), or nothing."""
    root: dict = {}
    stack: list[tuple[int, dict]] = [(0, root)]
    pending: tuple[dict, str, int] | None = None  # (parent, key, key_indent)
    for raw in text.splitlines():
        if not raw.strip() or raw.strip().startswith("#"):
            continue
        indent = len(raw) - len(raw.lstrip())
        line = raw.strip()
        if pending is not None and indent <= pending[2]:
            parent, key, _ = pending
            parent.setdefault(key, {})
            pending = None
        while len(stack) > 1 and indent < stack[-1][0]:
            stack.pop()
        cur = stack[-1][1]
        if line.startswith("- "):
            item = line[2:].strip().strip("'\"")
            if pending is not None:
                parent, key, _ = pending
                lst = parent.setdefault(key, [])
                if not isinstance(lst, list):
                    lst = parent[key] = []
                lst.append(item)
            continue
        if ":" in line:
            if pending is not None and indent > pending[2]:
                parent, key, _ = pending
                child = parent.setdefault(key, {})
                if not isinstance(child, dict):
                    child = parent[key] = {}
                stack.append((indent, child))
                pending = None
            cur = stack[-1][1]
            k, _, v = line.partition(":")
            k, v = k.strip(), v.strip()
            if v == "":
                pending = (cur, k, indent)
            else:
                v = v.strip("'\"")
                cur[k] = int(v) if v.isdigit() else v
    if pending is not None:
        parent, key, _ = pending
        parent.setdefault(key, {})
    return root


def _conn(d: dict) -> ConnInfo:
    return ConnInfo(
        host=str(d.get("host", "")),
        port=int(d.get("port", 0) or 0),
        username=str(d.get("username", d.get("user", ""))),
        password=str(d.get("password", "")),
        database=str(d.get("database", d.get("dbname", ""))),
        db_type=str(d.get("dbType", d.get("dbtype", "mysql"))),
    )


def load_config(path: str) -> Config:
    with open(path, encoding="utf-8") as fh:
        d = parse_simple_yaml(fh.read())
    return Config(
        src=_conn(d.get("src", {})),
        dest=_conn(d.get("dest", {})),
        page_size=int(d.get("pageSize", 100_000)),
        max_parallel=int(d.get("maxParallel", 100)),
        batch_row_size=int(d.get("batchRowSize", 1000)),
        exclude=list(d.get("exclude", []) or []),
        tables={k.upper(): v for k, v in (d.get("tables", {}) or {}).items()},
    )
