"""Lake configuration: TOML ⇄ dataclasses, same shape as the reference config
(/root/reference/src/lake/config.rs:6-14: `stores = [{filename, readonly}]`)."""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field


@dataclass(frozen=True)
class StoreEntry:
    filename: str
    readonly: bool = False


@dataclass(frozen=True)
class LakeConfig:
    stores: tuple[StoreEntry, ...] = field(default_factory=tuple)

    @staticmethod
    def from_toml_str(s: str) -> "LakeConfig":
        raw = tomllib.loads(s)
        return LakeConfig(
            stores=tuple(
                StoreEntry(filename=e["filename"], readonly=bool(e.get("readonly", False)))
                for e in raw.get("stores", ())
            )
        )

    def to_toml_string(self) -> str:
        out = []
        for e in self.stores:
            out.append("[[stores]]")
            out.append(f'filename = "{e.filename}"')
            out.append(f"readonly = {'true' if e.readonly else 'false'}")
            out.append("")
        return "\n".join(out)
