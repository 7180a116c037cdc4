#!/usr/bin/env python3
"""Animated viewer for .spy sparsity-pattern recordings.

Reads the binary format written by sleipnir_tpu.util.spy.Spy (same layout
as the reference's util/spy.hpp:20-44 recorder): three length-prefixed
UTF-8 strings (title, row label, column label), int32 rows, int32 cols,
then one frame per solver iteration — int32 nnz followed by nnz entries of
(int32 row, int32 col, 1-byte sign in {'+', '-', '0'}).

Usage:
    python tools/spy.py H.spy [A_e.spy ...]
"""

from __future__ import annotations

import struct
import sys


def read_spy(path: str):
    with open(path, "rb") as f:
        def read_str() -> str:
            (length,) = struct.unpack("<i", f.read(4))
            return f.read(length).decode("utf-8")

        title = read_str()
        row_label = read_str()
        col_label = read_str()
        rows, cols = struct.unpack("<ii", f.read(8))

        frames = []
        while True:
            head = f.read(4)
            if len(head) < 4:
                break
            (nnz,) = struct.unpack("<i", head)
            rs, cs, signs = [], [], []
            for _ in range(nnz):
                r, c = struct.unpack("<ii", f.read(8))
                sign = f.read(1)
                rs.append(r)
                cs.append(c)
                signs.append(1 if sign == b"+" else (-1 if sign == b"-" else 0))
            frames.append((rs, cs, signs))
    return title, row_label, col_label, rows, cols, frames


def animate(path: str) -> None:
    import matplotlib.animation as animation
    import matplotlib.pyplot as plt

    title, row_label, col_label, rows, cols, frames = read_spy(path)
    fig, ax = plt.subplots()
    ax.set_title(title)
    ax.set_xlabel(col_label)
    ax.set_ylabel(row_label)
    ax.set_xlim(-0.5, cols - 0.5)
    ax.set_ylim(rows - 0.5, -0.5)
    ax.set_aspect("equal")
    pos = ax.plot([], [], "s", color="tab:blue", markersize=2)[0]
    neg = ax.plot([], [], "s", color="tab:red", markersize=2)[0]
    label = ax.text(0.02, 1.02, "", transform=ax.transAxes)

    def update(i):
        rs, cs, signs = frames[i]
        pos.set_data(
            [c for c, s in zip(cs, signs) if s >= 0],
            [r for r, s in zip(rs, signs) if s >= 0],
        )
        neg.set_data(
            [c for c, s in zip(cs, signs) if s < 0],
            [r for r, s in zip(rs, signs) if s < 0],
        )
        label.set_text(f"iteration {i}/{len(frames) - 1}")
        return pos, neg, label

    _anim = animation.FuncAnimation(
        fig, update, frames=len(frames), interval=250, blit=False
    )
    plt.show()


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(1)
    for path in sys.argv[1:]:
        animate(path)


if __name__ == "__main__":
    main()
