"""Slice — the reference's legacy report API (``tinyolap/slice.py:13``),
a thin definition-dict front-end over :class:`~tinyolap_spark.view.View`.

Definition format (reference README idiom)::

    Slice(cube, {
        "title": "Sales 2023",
        "header": [{"dimension": "years", "member": "2023"}],
        "rows":   [{"dimension": "regions"}],            # all members
        "columns": [{"dimension": "measures",
                     "members": ["Sales", "Cost", "Profit"]}],
    })
"""

from __future__ import annotations

from typing import Any, Optional

from .cube import Cube
from .view import View


class Slice:
    def __init__(self, cube: Cube, definition: Optional[dict] = None):
        definition = definition or {}
        self.title = definition.get("title", "")
        self.definition = definition

        def axis(key):
            out = []
            for spec in definition.get(key, []):
                dim = spec["dimension"]
                if "member" in spec:
                    out.append((dim, [spec["member"]]))
                elif "members" in spec:
                    out.append((dim, list(spec["members"])))
                elif "subset" in spec:
                    out.append((dim, spec["subset"]))
                else:
                    out.append((dim, "*"))
            return out

        self.view = View(
            cube,
            filters=axis("header") or None,
            rows=axis("rows") or None,
            columns=axis("columns") or None,
            zero_suppression=bool(definition.get("zero_suppression", False)),
            name=self.title or "slice",
        )
        self.view.refresh()

    def refresh(self) -> "Slice":
        self.view.refresh()
        return self

    @property
    def stats(self) -> dict[str, Any]:
        return self.view.stats

    def __str__(self) -> str:
        head = f"{self.title}\n" if self.title else ""
        return head + self.view.to_console()

    def as_console_output(self) -> str:
        return str(self)

    def as_html(self) -> str:
        return self.view.to_html()

    def as_csv(self) -> str:
        d = self.view.to_dict()
        lines = [
            ",".join([""] + [" / ".join(c) for c in d["columns"]])
        ]
        for row in d["rows"]:
            cells = [
                "" if v is None else str(v) for v in row["cells"]
            ]
            lines.append(",".join([" / ".join(row["row"])] + cells))
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return self.view.to_dict()
