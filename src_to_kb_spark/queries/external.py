"""External-server search with local fallback (search.js:82-128) —
the query-side sibling of the S11-S13 REST sinks.

Hermetic by construction (build mandate: no network): the remote
search and the validation probe are injected callables, exactly like
``sinks/rest.py``'s sender injection.  Semantics pinned to the
reference:

* remote configured + validation fails → raise (fail fast, NO
  fallback — validateExternalServer is called OUTSIDE the try in
  searchExternal, search.js:94-96)
* validation passes + remote call raises → warn + fall back to the
  local search (search.js:119-126)
* remote result with a ``response`` field → {answer, confidence 0.9,
  external, mode-name} (search.js:101-109)
* any other remote result shape → JSON.stringify with 2-space indent,
  confidence 0.8 (search.js:110-117)
* validation result cached across searches (serverValidated,
  search.js:42-49)
"""

from __future__ import annotations

import json
from collections.abc import Callable

# modes.js display names (getCurrentMode().name)
MODE_DISPLAY_NAME = {
    "developer": "Developer",
    "enduser": "End User",
    "copilot": "Copilot",
}


class ExternalSearchError(RuntimeError):
    """Remote search failure — triggers local fallback."""


class KnowledgeBaseSearch:
    """search.js KnowledgeBaseSearch's external/local routing, with the
    engine-side local search injected as a callable returning the
    answer dict (e.g. ``answers.answer_from_df`` over a chunk search).
    """

    def __init__(
        self,
        local_search: Callable[[str], dict],
        remote_search: Callable[[str], dict] | None = None,
        validate_remote: Callable[[], None] | None = None,
        mode: str = "developer",
    ) -> None:
        self.local_search = local_search
        self.remote_search = remote_search
        self.validate_remote = validate_remote
        self.mode = mode
        self.server_validated = False

    def search(self, query: str) -> dict:
        if self.remote_search is not None:
            return self._search_external(query)
        return self.local_search(query)

    def _validate(self) -> None:
        if self.server_validated:
            return
        if self.validate_remote is not None:
            self.validate_remote()  # raises → fail fast, no fallback
        self.server_validated = True

    def _search_external(self, query: str) -> dict:
        self._validate()
        try:
            result = self.remote_search(query)
        except Exception:
            # remote down mid-flight → local fallback (search.js:119-126)
            return self.local_search(query)
        mode_name = MODE_DISPLAY_NAME.get(self.mode, self.mode)
        if isinstance(result, dict) and "response" in result:
            return {
                "answer": result["response"],
                "confidence": 0.9,
                "external": True,
                "mode": mode_name,
            }
        return {
            "answer": json.dumps(result, indent=2),
            "confidence": 0.8,
            "external": True,
            "mode": mode_name,
        }
