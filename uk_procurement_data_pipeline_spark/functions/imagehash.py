"""Perceptual image hashing: dHash (difference hash) over grayscale
pixels, emitted as four 16-bit LSH bands.

The classic dHash recipe (Krawetz, "Kind of Like That", 2013): downsample
to a 9x8 grid, compare horizontally adjacent cells, pack the 64
greater-than bits. Near-identical images differ in only a few bits, so
Hamming-distance candidate pairing reduces to the SAME banded equi-join
idiom as MinHash LSH (queries/dedup.py): split the 64 bits into four
16-bit bands — two images within Hamming distance 4 of each other agree
on at least one band whenever their differing bits do not spread across
all four bands, and the exact popcount refine keeps only true near-dups.

Pure-python and deterministic: the Spark side runs this inside an Arrow
batch over REAL decoded PNG pixels (functions/png.py), and the DuckDB
oracle recomputes the identical integers from the pixel-generation rule
(the PNG roundtrip is lossless), so a codec bug hash-mismatches.

Downsampling is nearest-neighbor striding (gy = y*h//8, gx = x*w//9) —
integer-exact in both engines, unlike area-averaging which would demand
a float contract for no extra test power.
"""

from __future__ import annotations

GRID_W = 9  # downsample grid: 9 columns -> 8 horizontal comparisons
GRID_H = 8  # 8 rows
N_BANDS = 4  # 4 bands x 16 bits = 64-bit dHash


def dhash_bands(pixels: list[int] | bytes, w: int, h: int) -> tuple[int, ...]:
    """64-bit dHash of a flat grayscale image, as four 16-bit band ints.

    Bit layout: band b covers grid rows 2b and 2b+1; within a band, the
    bit for grid cell (y, x) sits at position (y % 2) * 8 + x. Kept
    explicit so the DuckDB oracle can rebuild the exact integers.
    """
    if w < GRID_W or h < GRID_H:
        raise ValueError(f"image {w}x{h} smaller than {GRID_W}x{GRID_H} grid")
    grid = [
        [pixels[(y * h // GRID_H) * w + (x * w // GRID_W)] for x in range(GRID_W)]
        for y in range(GRID_H)
    ]
    bands = [0] * N_BANDS
    for y in range(GRID_H):
        for x in range(GRID_W - 1):
            if grid[y][x + 1] > grid[y][x]:
                bands[y // 2] |= 1 << ((y % 2) * 8 + x)
    return tuple(bands)


def hamming(bands_a: tuple[int, ...], bands_b: tuple[int, ...]) -> int:
    """Hamming distance between two band tuples (test helper)."""
    return sum(bin(a ^ b).count("1") for a, b in zip(bands_a, bands_b))
