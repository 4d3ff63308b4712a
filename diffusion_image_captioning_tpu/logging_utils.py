"""Experiment tracking: run-name codec files, reference-format logs, parsing.

The reference's tracking system is a config-encoding filename plus an
append-only text log (CLIP-DDPM.py:116-119,509,554) parsed offline by a
regex float-scraper (notebook cell 26, ``extract_float``). We keep the
filename codec and line format byte-compatible so logs from both frameworks
co-plot, and add structured CSV emission as a strict extra
(SURVEY.md section 5.5).
"""

from __future__ import annotations

import csv
import os
import re
from typing import Optional, TextIO

from diffusion_image_captioning_tpu.config import Config, model_name

_FLOAT_RE = re.compile(r"[-+]?\d*\.\d+(?:[eE][-+]?\d+)?|[-+]?\d+(?:[eE][-+]?\d+)?")


def extract_floats(line: str) -> list[float]:
    """All floats in a log line — the notebook's parser (cell 26), usable on
    both reference logs and ours."""
    return [float(m) for m in _FLOAT_RE.findall(line)]


def parse_epoch_lines(path: str) -> list[dict]:
    """Parse 'epoch N average ...' lines into dicts of the six losses."""
    rows = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            if line.startswith("epoch ") and "average" in line and ":" in line:
                head, _, tail = line.partition(":")
                vals = extract_floats(tail)  # loss-name digits live in head
                if len(vals) >= 6:
                    rows.append(
                        {
                            "epoch": int(extract_floats(head)[0]),
                            "train_x_t": vals[0],
                            "train_x_1": vals[1],
                            "train_prob": vals[2],
                            "val_x_t": vals[3],
                            "val_x_1": vals[4],
                            "val_prob": vals[5],
                        }
                    )
    return rows


def parse_bleu(path: str) -> Optional[float]:
    """The final 'BLEU-4 score:' value of a run log (ours or a reference
    trial log), or None if the run never reached eval. The last occurrence
    wins — CONTINUE_TRAIN appends a fresh eval to the same file."""
    score = None
    with open(path, encoding="utf-8") as f:
        for line in f:
            if "BLEU-4 score:" in line:
                vals = extract_floats(line.split("BLEU-4 score:", 1)[1])
                if vals:
                    score = vals[0]
    return score


class Summary:
    """Append-mode run log named by the config codec (CLIP-DDPM.py:509),
    optionally mirrored to a CSV with structured columns."""

    def __init__(
        self,
        cfg: Config,
        directory: str = ".",
        csv_mirror: bool = True,
        stream: Optional[TextIO] = None,
    ):
        self.name = model_name(cfg)
        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, f"{self.name}.txt")
        self._owns_fh = stream is None
        # explicit utf-8: raw captions land in this file and the parsers
        # read it as utf-8 — a C-locale container default would
        # UnicodeEncodeError mid-run on the first non-ASCII caption
        self._fh = (
            stream
            if stream is not None
            else open(self.path, "a", encoding="utf-8")
        )
        if self._owns_fh and os.path.getsize(self.path):
            # Each completed run ends with an UNTERMINATED "BLEU-4 score:"
            # line (reference byte parity, CLIP-DDPM.py:631). A resumed
            # (CONTINUE_TRAIN) run appending to that file would glue its
            # first write onto it — the reference does exactly that, and
            # the glued "...score: Xepoch 0 average..." line is dropped by
            # every epoch parser (ours and the reference's extract_float).
            # Deliberate deviation (docs/PARITY.md): terminate the old line
            # before appending a new segment.
            with open(self.path, "rb") as f:
                f.seek(-1, os.SEEK_END)
                if f.read(1) != b"\n":
                    self._fh.write("\n")
        self._csv_path = (
            os.path.join(directory, f"{self.name}.csv") if csv_mirror else None
        )
        self._csv_started = bool(
            self._csv_path and os.path.exists(self._csv_path)
        )

    def write(self, text: str) -> None:
        self._fh.write(text)

    def flush(self) -> None:
        self._fh.flush()

    def epoch_row(self, row: dict) -> None:
        if not self._csv_path:
            return
        write_header = not self._csv_started
        with open(self._csv_path, "a", newline="", encoding="utf-8") as f:
            w = csv.DictWriter(f, fieldnames=list(row.keys()))
            if write_header:
                w.writeheader()
                self._csv_started = True
            w.writerow(row)

    def close(self) -> None:
        # only close a handle Summary opened itself — a caller-provided
        # stream (e.g. sys.stdout) is not ours to close
        if self._fh is not None and self._owns_fh:
            self._fh.close()
