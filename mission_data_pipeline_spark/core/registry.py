"""Plugin registry.

Parity: reference ``src/mdp/core/registry.py:8-101`` — decorator
registration per kind, lookup with a helpful KeyError listing what IS
registered, ``list_*``, module-level singleton. Powers the CLI's
name-based stage construction.
"""

from __future__ import annotations

from collections.abc import Callable


class Registry:
    def __init__(self) -> None:
        self._stages: dict[str, dict[str, type]] = {
            "extractor": {},
            "transformer": {},
            "loader": {},
        }

    def _register(self, kind: str, name: str) -> Callable[[type], type]:
        def deco(cls: type) -> type:
            self._stages[kind][name] = cls
            cls.name = name  # type: ignore[attr-defined]
            return cls

        return deco

    def extractor(self, name: str) -> Callable[[type], type]:
        return self._register("extractor", name)

    def transformer(self, name: str) -> Callable[[type], type]:
        return self._register("transformer", name)

    def loader(self, name: str) -> Callable[[type], type]:
        return self._register("loader", name)

    def _get(self, kind: str, name: str) -> type:
        try:
            return self._stages[kind][name]
        except KeyError:
            known = ", ".join(sorted(self._stages[kind])) or "<none>"
            raise KeyError(
                f"no {kind} named {name!r}; registered: {known}"
            ) from None

    def get_extractor(self, name: str) -> type:
        return self._get("extractor", name)

    def get_transformer(self, name: str) -> type:
        return self._get("transformer", name)

    def get_loader(self, name: str) -> type:
        return self._get("loader", name)

    def list_extractors(self) -> list[str]:
        return sorted(self._stages["extractor"])

    def list_transformers(self) -> list[str]:
        return sorted(self._stages["transformer"])

    def list_loaders(self) -> list[str]:
        return sorted(self._stages["loader"])


#: Module-level singleton (reference ``registry.py:98-101``).
registry = Registry()
