"""Shared literal parameters.

Single source of truth for every constant that appears BOTH in a Spark
plan and in its DuckDB oracle SQL — one definition means the two engines
can never drift. Values mirror the reference defaults where one exists
(cited inline).
"""

# --- temporal operators (events table; seconds) -------------------------
# The reference works on 30-120 Hz gaze streams (sub-second windows); the
# events test table is one month at ~2 events/user/day, so every window is
# rescaled to that cadence — semantics identical, constants proportional.
MATCH_WINDOW_S = 21600.0        # match_time_points window (utils.py:67)
SESSION_GAP_S = 172800.0        # split_timecourse max_epoch_gap (marker_parsing.py:187)
SESSION_MIN_S = 259200.0        # min_epoch_length
SESSION_MAX_S = 2592000.0       # max_epoch_length
BRIEF_MIN_S = 259200.0          # remove_brief_detections duration_threshold (marker_parsing.py:53)
RESAMPLE_STEP_S = 21600.0       # resample_data 1/fps (utils.py:581) — 6-hourly, ~2x the signal cadence
DETREND_WINDOW_S = 604800.0     # detrend_median window_seconds (labeling.py:773)

# --- outliers (utils.py:545 remove_outliers) -----------------------------
Z_THRESHOLD = 2.5
ABS_MIN = 1.0
ABS_MAX = 500.0

# --- size / bimodality filters (marker_parsing.py:114,:31) ---------------
SIZE_STD_THRESHOLD = 2.0
ASPECT_RATIO_THRESHOLD = 1.2
BIMODAL_STD_SEP = 2.5

# --- clustering (marker_parsing.py:299 cluster_marker_points) ------------
GRID_T_EPS_S = 259200.0         # grid cell size in time (3 days)
GRID_V_EPS = 100.0              # grid cell size in value
GRID_MIN_PTS = 4                # core-cell density threshold
CLUSTER_MIN_T_S = 3600.0        # min_cluster_time
CLUSTER_MAX_T_S = 259200.0      # max_cluster_time
CLUSTER_MAX_STD = 35.0          # max_cluster_std (value units)

# --- gaze geometry (error_computation.py:18 compute_error) ---------------
IMAGE_W = 2048
IMAGE_H = 1536
DEG_HORIZ = 101.0
DEG_VERT = 75.75
MIN_CONFIDENCE = 0.6
ERROR_OUTLIER_STDS = 4.0
HIST_BINS = 10                  # histogram2d weighting grid

# --- labeling (labeling.py; thresholds scaled to event-data cadence) -----
SACCADE_VEL_THRESHOLD = 0.003   # deg/s; ~p75 of derived velocity
SACCADE_MIN_S = 3600.0
SACCADE_MAX_S = 604800.0
BLINK_CONF_THRESHOLD = 0.3      # detect_blinks_confidence (labeling.py:444)
BLINK_MIN_S = 43200.0
BLINK_MAX_S = 1209600.0
RATE_WINDOW_S = 86400.0         # get_saccade_rate window (labeling.py:508)

# --- text / dedup ---------------------------------------------------------
SHINGLE_K = 5                   # char shingle width
JACCARD_THRESHOLD = 0.7         # testdata has planted near-dupes >= 0.7
MINHASH_PERMS = 16
MINHASH_BANDS = 4               # 4 bands x 4 rows
MINHASH_PRIME = 2147483647      # 2^31-1: a*h fits in int64
SIMHASH_BITS = 60               # portable_hash60 width
WINNOW_WINDOW = 4               # winnowing fingerprint window
COSINE_DUP_THRESHOLD = 0.35     # testdata embeddings: top ~0.1% of pairs
ANN_K = 5
ANN_N_QUERIES = 10

# MinHash permutations (a*h + b) mod MINHASH_PRIME — fixed literals shared
# by the Spark plan and the SQL oracle (seeded stdlib RNG, no numpy dep).
import random as _random

_rng = _random.Random(42)
MINHASH_AB = [
    (_rng.randrange(1, MINHASH_PRIME), _rng.randrange(0, MINHASH_PRIME))
    for _ in range(MINHASH_PERMS)
]
del _rng

# Random-hyperplane LSH for ANN: 8 planes x 64 dims, fixed literals
# (seeded, rounded so the SQL literal text and the Spark literal are the
# exact same doubles).
LSH_N_PLANES = 8
_rng = _random.Random(7)
LSH_PLANES = [
    [round(_rng.gauss(0.0, 1.0), 6) for _ in range(64)] for _ in range(LSH_N_PLANES)
]
del _rng

# Language-ID marker stopwords (argmax of marker-token counts; ties favor
# listing order) and quality-scoring stopword list.
LANG_MARKERS = {
    "en": ("the", "a", "and"),
    "de": ("der", "die", "und"),
    "es": ("el", "la", "los"),
}
STOPWORDS = ("the", "a", "and", "of", "to")

# --- TPC-H-ish relational params -----------------------------------------
Q1_CUTOFF = "1998-09-02"
Q3_SEGMENT = "BUILDING"
Q3_DATE = "1995-03-15"
Q5_REGION = "ASIA"
Q5_DATE_FROM = "1996-01-01"
Q5_DATE_TO = "1997-01-01"
Q6_DATE_FROM = "1996-01-01"
Q6_DATE_TO = "1997-01-01"
Q6_DISCOUNT_LO = 0.05
Q6_DISCOUNT_HI = 0.07
Q6_QUANTITY = 24.0

# Deterministic synthetic gaze-signal derivation (integer arithmetic only,
# so Spark and DuckDB agree exactly). Multipliers are arbitrary primes.
GAZE_DERIVE = {
    "px": (2654435761, 1000),
    "py": (40503, 1000),
    "gx_jitter": (9176, 21),
    "gy_jitter": (7919, 21),
    "conf": (104729, 100),
}
