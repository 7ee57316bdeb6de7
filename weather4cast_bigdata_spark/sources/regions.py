"""The reference's hard-coded geographic constants as catalog dims.

These are the schema-by-convention tables of the reference
(SURVEY.md §1.3): region crop anchors (datasets.py:113-125), the crop
size (datasets.py:127), and the per-competition region rosters
(main.py:48-52 — note the reference's ``regions_for_dir`` is missing
its ``return``, so callers silently fall back to the core list; we
implement the intended semantics, SURVEY.md §2.2 quirk note). A user
switching from the reference gets the same constants as broadcastable
dimension tables instead of module globals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# datasets.py:113-125 — (j0, i0) anchor of each 256×256 crop in the
# full European grid.
REGION_COORDINATES: dict[str, tuple[int, int]] = {
    "R1": (1850, 760),
    "R2": (1550, 200),
    "R3": (935, 400),
    "R4": (1020, 670),
    "R5": (1300, 550),
    "R6": (1270, 250),
    "R7": (1700, 470),
    "R8": (750, 670),
    "R9": (450, 760),
    "R10": (250, 500),
    "R11": (1000, 130),
}

REGION_SIZE: tuple[int, int] = (256, 256)  # datasets.py:127

# main.py:48-52, intended semantics (the missing-return quirk).
CORE_REGIONS: tuple[str, ...] = ("R1", "R2", "R3", "R7", "R8")
TRANSFER_REGIONS: tuple[str, ...] = ("R4", "R5", "R6", "R9", "R10", "R11")


def regions_for_dir(comp_dir: str) -> tuple[str, ...]:
    """Competition-stage region roster (main.py:48-52, with the
    intended ``return``)."""
    return CORE_REGIONS if "core" in comp_dir else TRANSFER_REGIONS


def region_dim(spark: SparkSession) -> DataFrame:
    """Crop-anchor dimension table — broadcast-join it on ``region``
    to turn full-grid (y, x) into region-local coordinates (the
    relational form of the reference's slice at datasets.py:102)."""
    h, w = REGION_SIZE
    return spark.createDataFrame(
        [(r, j0, i0, h, w) for r, (j0, i0) in REGION_COORDINATES.items()],
        ["region", "j0", "i0", "h", "w"],
    )
