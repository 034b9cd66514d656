"""Name sanitization / table identity (C8, C9, §1.1 TableId).

Reference: ``SourceDatabaseNameService.kt:5-27`` (topic name sanitize),
``TableId.kt:5-28`` (owner.table identity + struct-name normalization).
Driver-side string ops — no Spark involvement.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_SANITIZE_RE = re.compile(r"[^A-Za-z0-9._-]")


def sanitize_name(name: str) -> str:
    """``[^A-Za-z0-9._-] -> _`` (SourceDatabaseNameService.kt:5-18)."""
    return _SANITIZE_RE.sub("_", name)


@dataclass(frozen=True)
class TableId:
    """``owner.table`` identity (TableId.kt:5-28)."""

    owner: str
    table: str

    @property
    def fullname(self) -> str:
        return f"{self.owner}.{self.table}"

    @property
    def topic_name(self) -> str:
        return sanitize_name(self.fullname)

    @property
    def struct_name(self) -> str:
        """Capitalized, ``_t`` suffix stripped (TableId.kt:15-21)."""
        t = self.table
        if t.lower().endswith("_t"):
            t = t[:-2]
        return t.capitalize()

    @classmethod
    def parse(cls, qualified: str, default_owner: str = "") -> "TableId":
        if "." in qualified:
            owner, table = qualified.split(".", 1)
            return cls(owner, table)
        return cls(default_owner, qualified)
