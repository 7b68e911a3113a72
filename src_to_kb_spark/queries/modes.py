"""Answer-mode metadata introspection (modes.js:85-118 getAvailableModes
/ getCurrentMode; served by GET /api/v1/modes and /modes/{mode},
api-server.js:506-548).

The mode SEMANTICS — exclude filters (F2), priority re-sort (O2),
answer formatting — live in queries/search.py and queries/answers.py
and are oracle-checked; this module is only the metadata projection
those endpoints expose.  Values are pinned 1:1 to the reference's
ANSWER_MODES table (modes.js:4-88) by pytest."""

from __future__ import annotations

from .search import MODE_EXCLUDE, MODE_PRIORITIZE

# modes.js:7-8, :40-41, :62-63
_MODE_NAMES = {
    "enduser": "End User",
    "developer": "Developer",
    "copilot": "Copilot",
}
_MODE_DESCRIPTIONS = {
    "enduser": (
        "Simplified answers for non-technical users, avoiding internal "
        "implementation details"
    ),
    "developer": (
        "Detailed technical answers including architecture and "
        "implementation details"
    ),
    "copilot": (
        "Code-focused answers with examples and patterns for "
        "implementation"
    ),
}
# modes.js:27, :49, :76
_MODE_DEPTH = {"enduser": "low", "developer": "high", "copilot": "medium"}
# modes.js answerStyle.focusOn (:31, :53, :80)
_MODE_FOCUS = {
    "enduser": "features and capabilities",
    "developer": "technical implementation and architecture",
    "copilot": "code examples and implementation patterns",
}

DEFAULT_MODE = "developer"  # modes.js:91 constructor default


def get_all_modes() -> list[dict]:
    """getAvailableModes (modes.js:104-110): key/name/description per
    mode, in the reference's object-key order."""
    return [
        {
            "key": key,
            "name": _MODE_NAMES[key],
            "description": _MODE_DESCRIPTIONS[key],
        }
        for key in ("enduser", "developer", "copilot")
    ]


def get_mode_info(mode: str) -> dict | None:
    """GET /modes/{mode} (api-server.js:534-548): the full mode object
    — metadata plus the filter config the engine actually enforces
    (exclude pattern count + list, prioritizeTypes, depth).  Returns
    None for an unknown mode (the endpoint's 404)."""
    if mode not in _MODE_NAMES:
        return None
    return {
        "key": mode,
        "name": _MODE_NAMES[mode],
        "description": _MODE_DESCRIPTIONS[mode],
        "filters": {
            "excludePatterns": list(MODE_EXCLUDE[mode]),
            "nExcludePatterns": len(MODE_EXCLUDE[mode]),
            "prioritizeTypes": list(MODE_PRIORITIZE[mode]),
            "maxTechnicalDepth": _MODE_DEPTH[mode],
        },
        "answerStyle": {"focusOn": _MODE_FOCUS[mode]},
    }
