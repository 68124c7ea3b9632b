"""Deterministic synthetic multi-turn conversation corpus.

The engine's target table (BASELINE input_hint) is a transcript table
``(conv_id string, turn_idx int32, role string, text string,
tool string, ts timestamp)``. The conversation-level training-data
operators (``functions/conversations.py``) need a corpus with KNOWN
planted structure so their DuckDB oracles have real answers:

- exact duplicate conversations (same (turn_idx, role, text) sequence
  under a different conv_id and shifted timestamps),
- a boilerplate opening exchange shared verbatim across a large
  fraction of conversations (the cross-conversation repeated-turn
  detector must find it),
- occasional role-alternation violations (two consecutive user turns),
- tool-call turns (role='tool' with a tool name),
- varied lengths and token counts bounded so the render-truncation
  rule (keep the TAIL that fits the token budget) always keeps >= 1
  turn.

Everything is a pure seeded-numpy function of (n_convs, seed): both
the Spark query side and the SQL-oracle side materialize the identical
frame in either order.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

_USER_PHRASES = [
    "my invoice shows a charge i do not recognize",
    "the export job fails with a timeout after ten minutes",
    "how do i rotate the api key for the staging project",
    "please cancel the subscription on my second workspace",
    "the dashboard graph is empty for last week",
    "i want to move my data to the eu region",
    "login from the mobile app keeps asking for a code",
    "can you explain the difference between the two plans",
    "the webhook retries forever and floods our endpoint",
    "our admin left and we are locked out of billing",
]
_ASSISTANT_PHRASES = [
    "i checked the account and the charge comes from the overage tier",
    "the timeout is the worker limit you can raise it in settings",
    "you can rotate the key under project settings access tokens",
    "i have scheduled the cancellation at the end of the period",
    "the graph is empty because the retention window was exceeded",
    "region moves require an export and a fresh import i can start one",
    "the repeated code prompt means the device clock is skewed",
    "the higher plan adds audit logs and a longer retention window",
    "i disabled the retry storm and capped the backoff at one hour",
    "i escalated an ownership transfer to restore billing access",
]
_TOOL_NAMES = ["search", "billing_lookup", "export_job", "calc"]
_TOOL_PHRASES = [
    "lookup returned three matching records",
    "job queued with priority high",
    "balance query returned status ok",
    "computation finished with result 42",
]
_BOILER_USER = "hello i need some help with my account"
_BOILER_ASSISTANT = "hi there how can i help you today"
# exported for tests asserting the boilerplate detector finds it
_BOILER_ASSISTANT_EXPORTED = _BOILER_ASSISTANT

BASE_TS = pd.Timestamp("1995-01-01 00:00:00")


def gen_conversations(
    n_convs: int = 120,
    seed: int = 11,
    dup_frac: float = 0.15,
    boiler_frac: float = 0.6,
) -> pd.DataFrame:
    """Return the transcript frame described in the module docstring.

    The last ``round(n_convs * dup_frac)`` conversations are exact
    content duplicates of the first ones (new conv_id, ts shifted by a
    day) — a conversation fingerprint over (turn_idx, role, text) must
    collapse each duplicate onto its source.
    """
    rng = np.random.default_rng(seed)
    n_dups = int(round(n_convs * dup_frac))
    n_orig = n_convs - n_dups

    rows: list[tuple] = []
    per_conv: list[list[tuple]] = []
    for c in range(n_orig):
        conv_id = f"conv-{c:05d}"
        turns: list[tuple] = []
        t0 = BASE_TS + pd.Timedelta(seconds=int(rng.integers(0, 86_400 * 30)))
        idx = 0
        if rng.random() < boiler_frac:
            turns.append((idx, "user", _BOILER_USER, None))
            idx += 1
            turns.append((idx, "assistant", _BOILER_ASSISTANT, None))
            idx += 1
        n_ex = int(rng.integers(1, 6))  # 1..5 exchanges after the opener
        # ordinary turns carry a per-conversation case reference, so
        # (realistically) only the planted opener exchange and the
        # canned tool outputs repeat VERBATIM across conversations —
        # the boilerplate detector must find those and nothing else
        case = f"case {c:04d}"
        for _ in range(n_ex):
            u = _USER_PHRASES[int(rng.integers(len(_USER_PHRASES)))]
            turns.append((idx, "user", f"{u} {case}", None))
            idx += 1
            # ~10%: alternation violation — the user sends a second
            # message before any reply
            if rng.random() < 0.10:
                u2 = _USER_PHRASES[int(rng.integers(len(_USER_PHRASES)))]
                turns.append((idx, "user", f"{u2} {case}", None))
                idx += 1
            # ~25%: the assistant calls a tool before answering
            if rng.random() < 0.25:
                k = int(rng.integers(len(_TOOL_NAMES)))
                turns.append((idx, "tool", _TOOL_PHRASES[k], _TOOL_NAMES[k]))
                idx += 1
            a = _ASSISTANT_PHRASES[int(rng.integers(len(_ASSISTANT_PHRASES)))]
            turns.append((idx, "assistant", f"{a} {case}", None))
            idx += 1
        per_conv.append(turns)
        for (ti, role, text, tool) in turns:
            rows.append(
                (conv_id, ti, role, text, tool, t0 + pd.Timedelta(seconds=45 * ti))
            )

    # planted exact duplicates: content identical, id/ts fresh
    src_ids = rng.integers(0, n_orig, size=n_dups)
    for j, src in enumerate(src_ids):
        conv_id = f"conv-{n_orig + j:05d}"
        t0 = BASE_TS + pd.Timedelta(days=1, seconds=int(rng.integers(0, 86_400)))
        for (ti, role, text, tool) in per_conv[int(src)]:
            rows.append(
                (conv_id, ti, role, text, tool, t0 + pd.Timedelta(seconds=45 * ti))
            )

    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    # parquet timestamps must be microsecond precision for Spark reads
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df
