"""Note matching for transcription metrics (hermetic mir_eval replacement).

Implements the exact semantics of `mir_eval.transcription.match_notes` as used
by the reference (`eval.py:261-269`): onset tolerance window (0.05 s), no
offset matching (`offset_ratio=None`), pitch tolerance in *cents*
(`|1200*log2(est/ref)| <= pitch_tolerance`; the reference passes pitches*1000
with tolerance 1.0 cent, i.e. effectively exact pitch equality), and
maximum-cardinality bipartite matching (Hopcroft–Karp) over the feasible
pairs — identical TP counts to mir_eval.

mir_eval is not installed in this image; this module is the framework's own
metric core and is torch/TPU-free (pure numpy) so the eval harness is
hermetic.
"""

from __future__ import annotations

from collections import deque

import numpy as np

# mir_eval.transcription's distance-rounding precision (it rounds onset and
# offset distance matrices with np.around before comparing to the tolerance)
N_DECIMALS = 12


def hopcroft_karp(adjacency: list[list[int]], n_right: int) -> dict[int, int]:
    """Maximum bipartite matching. adjacency[i] = candidate right nodes for
    left node i. Returns {left: right}."""
    INF = float("inf")
    n_left = len(adjacency)
    match_l = [-1] * n_left
    match_r = [-1] * n_right
    dist = [0.0] * n_left

    def bfs() -> bool:
        queue = deque()
        for u in range(n_left):
            if match_l[u] == -1:
                dist[u] = 0
                queue.append(u)
            else:
                dist[u] = INF
        found = False
        while queue:
            u = queue.popleft()
            for v in adjacency[u]:
                w = match_r[v]
                if w == -1:
                    found = True
                elif dist[w] == INF:
                    dist[w] = dist[u] + 1
                    queue.append(w)
        return found

    def dfs(u: int) -> bool:
        for v in adjacency[u]:
            w = match_r[v]
            if w == -1 or (dist[w] == dist[u] + 1 and dfs(w)):
                match_l[u] = v
                match_r[v] = u
                return True
        dist[u] = INF
        return False

    while bfs():
        for u in range(n_left):
            if match_l[u] == -1:
                dfs(u)
    return {u: match_l[u] for u in range(n_left) if match_l[u] != -1}


def match_notes(
    ref_intervals: np.ndarray,
    ref_pitches: np.ndarray,
    est_intervals: np.ndarray,
    est_pitches: np.ndarray,
    onset_tolerance: float = 0.05,
    pitch_tolerance: float = 50.0,
    offset_ratio: float | None = None,
) -> list[tuple[int, int]]:
    """-> list of (ref_index, est_index) matched pairs (mir_eval-compatible)."""
    ref_intervals = np.atleast_2d(np.asarray(ref_intervals, dtype=np.float64))
    est_intervals = np.atleast_2d(np.asarray(est_intervals, dtype=np.float64))
    ref_pitches = np.asarray(ref_pitches, dtype=np.float64).reshape(-1)
    est_pitches = np.asarray(est_pitches, dtype=np.float64).reshape(-1)
    if len(ref_pitches) == 0 or len(est_pitches) == 0:
        return []

    if offset_ratio is None:
        from adt_str_tpu.native import native

        mod = native()
        if mod is not None:
            pairs = mod.match_notes(
                ref_intervals[:, 0].tolist(),
                ref_pitches.tolist(),
                est_intervals[:, 0].tolist(),
                est_pitches.tolist(),
                float(onset_tolerance),
                float(pitch_tolerance),
            )
            return sorted((int(a), int(b)) for a, b in pairs)

    # mir_eval rounds distances before the compare (transcription.match_notes:
    # "Round distances to a target precision to avoid the situation where if
    # the distance is exactly 50ms ... it erroneously doesn't match because
    # of precision issues"). On the 10 ms token grid, deltas of exactly the
    # 0.05 s tolerance are common: 0.65-0.6 = 0.05000000000000004 in fp64.
    onset_ok = (
        np.around(
            np.abs(ref_intervals[:, 0][:, None] - est_intervals[:, 0][None, :]),
            decimals=N_DECIMALS,
        )
        <= onset_tolerance
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        cents = 1200.0 * np.abs(
            np.log2(est_pitches[None, :] / ref_pitches[:, None])
        )
    pitch_ok = cents <= pitch_tolerance
    feasible = onset_ok & pitch_ok

    if offset_ratio is not None:
        ref_durations = ref_intervals[:, 1] - ref_intervals[:, 0]
        offset_tol = np.maximum(offset_ratio * ref_durations, 0.05)
        offset_ok = (
            np.around(
                np.abs(ref_intervals[:, 1][:, None] - est_intervals[:, 1][None, :]),
                decimals=N_DECIMALS,
            )
            <= offset_tol[:, None]
        )
        feasible &= offset_ok

    adjacency = [np.where(row)[0].tolist() for row in feasible]
    matching = hopcroft_karp(adjacency, len(est_pitches))
    return sorted(matching.items())
