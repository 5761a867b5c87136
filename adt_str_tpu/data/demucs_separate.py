"""Demucs drum-stem separation wrapper (parity with
`data_modules/demucs_seaprate.py:24-75`): shells out to the `demucs` CLI
(`-n htdemucs --two-stems drums`) and renames the stems. Demucs is an external
preprocessing dependency (SURVEY.md §2.3 keeps it out-of-scope as a CLI
step); a clear error is raised when it is not installed.
"""

from __future__ import annotations

import logging
import shutil
import subprocess
from pathlib import Path

logger = logging.getLogger(__name__)


def separate_drums(
    files: list[str], output_dir: str = "demucs_output", model: str = "htdemucs"
) -> list[Path]:
    if shutil.which("demucs") is None:
        raise RuntimeError(
            "demucs CLI not found — install demucs to run drum-stem separation"
        )
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    # outputs are keyed by the input STEM (reference convention): two inputs
    # sharing a basename would silently clobber each other — detect BEFORE
    # the first minutes-long demucs run, not mid-pipeline
    stems = [Path(f).stem for f in files]
    dupes = {s for s in stems if stems.count(s) > 1}
    if dupes:
        raise ValueError(
            f"duplicate input basenames {sorted(dupes)}: demucs outputs are "
            "keyed by stem; rename the inputs or separate in batches"
        )
    results: list[Path] = []
    for file in files:
        file_path = Path(file)
        subprocess.run(
            ["demucs", "-n", model, "--two-stems", "drums", "-o", str(output_dir), str(file_path)],
            check=True,
        )
        song_name = file_path.stem
        drum_path = output_dir / model / song_name / "drums.wav"
        final_path = output_dir / f"{song_name}_drums.wav"
        if drum_path.exists():
            drum_path.rename(final_path)
            results.append(final_path)
        else:
            logger.warning("demucs produced no drums stem for %s", file)
        nodrum_path = output_dir / model / song_name / "no_drums.wav"
        if nodrum_path.exists():
            nodrum_path.rename(output_dir / f"{song_name}_no_drums.wav")
    return results
