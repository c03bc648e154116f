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
MARKER_MIN_CLUSTERS = 1         # find_epochs min_n_clusters (marker_parsing.py:485,
                                # rescaled: ref default 5 at 120 Hz; gates
                                # 30 of 46 epochs on the test cadence)

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
EYELID_NEG_VEL = -4e-6          # eyelid closing velocity (labeling.py:381
EYELID_POS_VEL = 4e-6           # negative/positive_velocity_threshold,
                                # rescaled to event-data cadence; ~p25/p75
                                # of the derived fraction velocity)
# _detect_blinks_eyevel's per-phase gates (labeling.py:310), the
# reference's millisecond defaults (10/250/17/30/16/500 ms) rescaled by
# one factor (BLINK scale 2.7e6 = BLINK_MIN_S / min_full_blink) to the
# event-data cadence — the ratios are the reference's, the unit is ours
BLINK_CLOSE_MIN_S = 27_000.0    # min_eye_closing_time
BLINK_CLOSE_MAX_S = 675_000.0   # max_eye_closing_time
BLINK_CLOSURE_MAX_S = 45_900.0  # max_full_closure_time
BLINK_OPEN_MIN_S = 81_000.0     # min_eye_opening_time
FIXATION_MIN_S = 43200.0        # fixation duration bounds (complement of
FIXATION_MAX_S = 1209600.0      # saccade runs; labeling.py:529 intent)
FIXATION_MAX_EXTENT_DEG = 40.0  # position-stability gate (deg)
BINOCULAR_CUTOFF_S = 21600.0    # max eye0<->eye1 pairing distance
                                # (gaze_mappers.py:104 temporal_cutoff,
                                # fixed instead of framerate-adaptive)

# --- text / dedup ---------------------------------------------------------
SHINGLE_K = 5                   # char shingle width
JACCARD_THRESHOLD = 0.7         # testdata has planted near-dupes >= 0.7
MINHASH_PERMS = 16
MINHASH_BANDS = 4               # 4 bands x 4 rows
MINHASH_PRIME = 2147483647      # 2^31-1: a*h fits in int64
SIMHASH_BITS = 60               # portable_hash60 width
WINNOW_WINDOW = 4               # winnowing fingerprint window
# winnow_overlap (the MOSS-style pair report over doc_fingerprint):
# ignore fingerprints present in more than MAX_DF documents (ubiquitous
# boilerplate — MOSS's "too many documents" rule, and the hot-bucket
# bound: a fingerprint shared by B docs yields B^2 pair rows), and
# report only pairs sharing at least MIN_SHARED fingerprints.
WINNOW_MAX_DF = 10
WINNOW_MIN_SHARED = 2
# Random-projection dimensionality reduction (embed_project): the
# embeddings table contract (64-dim float vectors) and the output
# dimensionality of the ±1 projection (Achlioptas 2003).
EMB_DIM = 64
RP_DIM = 16
FEATURE_BINS = 16               # multimodal feature stub: byte-nibble bins
COSINE_DUP_THRESHOLD = 0.35     # testdata embeddings: top ~0.1% of pairs
ANN_K = 5
ANN_N_QUERIES = 10
# kNN label-classification report (r9): a larger probe set than the
# ANN family's 10 — accuracy over 10 queries is a coin flip, over 100
# it's a signal; k odd-ish to keep majority votes decisive more often
KNN_K = 15
KNN_N_QUERIES = 100

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

# Banded sign-LSH for embedding near-dup candidate generation: 8 bands ×
# 4 planes (32 planes total, seeded literals shared with the SQL oracle).
# Measured on sf0.01 embeddings at threshold 0.35: recall 0.73 of the
# exact pair set for 0.41× the pair work — the honest dial on
# near-uniform vectors at a loose threshold; at the cos ≥ 0.9 regime real
# near-dup corpora live in, the same config has recall > 0.99.
DEDUP_LSH_BANDS = 8
DEDUP_LSH_BITS = 4
_rng = _random.Random(11)
DEDUP_LSH_PLANES = [
    [round(_rng.gauss(0.0, 1.0), 6) for _ in range(64)]
    for _ in range(DEDUP_LSH_BANDS * DEDUP_LSH_BITS)
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
Q18_QUANTITY = 250.0            # ~p99 of per-order sum(l_quantity)
Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"
Q7_DATE_FROM = "1995-01-01"
Q7_DATE_TO = "1997-01-01"
# Q4/Q12 adapt the classic shapes to this schema (no l_commitdate /
# l_shipmode columns): the EXISTS predicate is a returned-item lineitem,
# the Q12 grouping column is l_returnflag, the "high priority" class is
# the classic urgent/high split.
Q4_DATE_FROM = "1996-01-01"
Q4_DATE_TO = "1996-04-01"
Q10_DATE_FROM = "1996-01-01"
Q10_DATE_TO = "1996-04-01"
Q10_TOPN = 20
Q12_DATE_FROM = "1996-01-01"
Q12_DATE_TO = "1997-01-01"
Q12_HIGH = ("1-URGENT", "2-HIGH")
Q14_DATE_FROM = "1996-01-01"
Q14_DATE_TO = "1996-02-01"
Q14_PROMO_TYPE = "PROMO"
Q16_EXCL_BRAND = "Brand#1"
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (1, 5, 9, 13, 17, 21, 25, 29)
# (brand, size_lo, size_hi, qty_lo, qty_hi) disjuncts — classic Q19
# minus the container/shipmode columns this schema doesn't carry.
Q19_TRIPLES = (
    ("Brand#3", 1, 5, 1.0, 11.0),
    ("Brand#14", 1, 10, 10.0, 20.0),
    ("Brand#21", 1, 15, 20.0, 30.0),
)
Q22_ORDER_CUTOFF = "2000-01-01"  # "no recent order" anti-join horizon
# Q21 adapts like Q4: "kept waiting" = the only supplier whose line was
# returned ('R') in a finished multi-supplier order.
Q21_NATION = "NATION_9"
Q21_TOPN = 100
# Q9/Q20 adapt to the partsupp-less schema: p_retailprice stands in for
# ps_supplycost (Q9's cost term); Q20's availqty test becomes "supplier
# shipped the majority of the part's window volume".
Q9_NAME_PREFIX = "red"
# PII scrub patterns: the Java/RE2 shared regex subset (no lookaround,
# no backrefs) so Spark and the DuckDB oracle run the same automaton.
# Applied in order; each class counted on the previous class's output.
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>", "n_email"),
    (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>", "n_phone"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>", "n_ip"),
]
Q20_NAME_PREFIX = "red"
Q20_NATION = "NATION_9"
Q20_DATE_FROM = "1996-01-01"
Q20_DATE_TO = "1997-01-01"
Q11_SHARE_MULT = 1500  # q·MULT > total ⇔ share > 1/MULT (1.33× the mean)

Q8_REGION = "ASIA"
Q8_TYPE = "ECONOMY"
Q8_NATION = "NATION_1"
Q8_DATE_FROM = "1995-01-01"
Q8_DATE_TO = "1997-01-01"

# --- corpus curation pipeline gates ---------------------------------------
# Chosen against the sf0.01 metric distributions (quality median ≈ 0.36,
# entropy 3.7-4.2 bits) so each gate is live but not empty.
CURATION_LANG = "en"
CURATION_MIN_TOKENS = 20
CURATION_MIN_QUALITY = 0.3
CURATION_ENTROPY_LO = 3.5
CURATION_ENTROPY_HI = 6.0
# repetition gates (curation_full): ≈ p90 of the corpus distributions,
# so the gates demonstrably cut the repetitive tail
CURATION_MAX_TOP_WORD = 0.14
CURATION_MAX_DUP_2GRAM = 0.06

# Deterministic synthetic gaze-signal derivation (integer arithmetic only,
# so Spark and DuckDB agree exactly). Multipliers are arbitrary primes.
GAZE_DERIVE = {
    "px": (2654435761, 1000),
    "py": (40503, 1000),
    "gx_jitter": (9176, 21),
    "gy_jitter": (7919, 21),
    "conf": (104729, 100),
}

# IVF coarse centroids: 16 fixed unit vectors (seeded, literal on both
# engines). A production index would k-means these; the PLAN (assign ->
# probe -> rerank) is identical either way.
IVF_CENTROIDS = (
    (0.0554, -0.0089, -0.1312, 0.0475, -0.0955, -0.0877, 0.072, -0.0208, -0.0021, -0.1508, -0.0741, 0.0738, -0.0423, 0.0827, -0.0401, 0.0229, 0.1114, 0.0445, -0.0967, 0.0893, -0.0136, 0.0257, -0.1943, 0.0877, 0.1922, 0.0828, 0.136, 0.3031, 0.0675, 0.3001, 0.0092, 0.2433, 0.1128, -0.0905, 0.0173, 0.0052, 0.0351, 0.1943, 0.0159, 0.051, -0.046, -0.2162, 0.1653, -0.1403, -0.0883, 0.2156, -0.0083, 0.1736, 0.0497, 0.0289, -0.0479, 0.1759, 0.0384, -0.2443, -0.2492, 0.1973, -0.0029, 0.0552, -0.0007, 0.0169, -0.111, 0.2246, 0.0219, 0.1257),
    (0.0344, -0.1426, 0.202, -0.2194, 0.1281, 0.1184, 0.1482, 0.0631, 0.1303, -0.1655, -0.0316, 0.1059, 0.0011, -0.0942, -0.0101, 0.1231, 0.1298, 0.1195, -0.0498, 0.0799, -0.1343, 0.2161, -0.019, -0.0439, -0.0875, -0.1992, 0.0061, 0.1298, 0.1896, -0.0746, 0.1691, 0.2097, -0.0481, 0.0404, 0.0263, 0.1469, -0.1122, -0.0574, -0.4157, -0.1059, 0.0454, -0.1232, 0.0761, -0.085, 0.0041, 0.1323, 0.1686, -0.0672, -0.129, -0.0642, -0.1128, 0.118, -0.0629, -0.0984, -0.1576, -0.1481, 0.126, 0.03, -0.0319, 0.1309, -0.0881, -0.04, -0.091, -0.0073),
    (-0.0224, 0.0006, 0.0137, 0.0575, -0.2185, 0.0761, -0.0118, 0.1817, -0.0652, 0.1477, 0.1066, -0.0398, 0.1514, 0.0917, -0.0776, -0.0809, -0.1444, -0.1333, -0.2402, 0.0828, -0.1663, -0.1449, -0.002, -0.0081, -0.0838, 0.1317, 0.1103, 0.0551, -0.0166, 0.1609, -0.014, 0.1586, -0.1606, 0.1765, -0.1188, -0.0388, 0.2836, 0.2434, -0.0354, -0.2591, -0.0113, 0.1148, -0.02, 0.1607, 0.0404, -0.0562, 0.0296, 0.0296, 0.0046, 0.1723, -0.0095, -0.1279, 0.1267, 0.1754, -0.0057, -0.0357, -0.0448, -0.2605, -0.0287, 0.0063, 0.0282, -0.1737, -0.2349, 0.0748),
    (-0.1967, 0.2467, -0.1174, -0.0251, -0.1784, 0.071, -0.0438, -0.1232, -0.0237, 0.116, 0.0584, 0.0145, 0.0086, 0.1468, -0.0054, -0.2645, 0.1516, -0.0439, -0.0549, 0.1228, -0.0165, 0.1094, -0.2263, 0.2861, 0.0048, 0.0619, 0.0745, 0.031, -0.0221, 0.0831, -0.0505, -0.0669, -0.0881, 0.0921, -0.1875, 0.1487, -0.0474, 0.1, 0.0257, -0.0659, 0.0504, -0.0998, -0.088, -0.1199, 0.0225, -0.1735, -0.1537, 0.0506, 0.043, 0.086, 0.0641, 0.1893, -0.0775, -0.1036, 0.0358, -0.0841, 0.149, -0.0631, 0.0861, -0.2468, -0.0414, -0.1613, -0.2432, -0.2682),
    (-0.1624, -0.0211, 0.0439, 0.0291, 0.1568, 0.109, -0.0353, 0.0503, -0.0097, 0.0056, -0.1585, -0.0637, 0.0342, -0.02, 0.1206, -0.001, 0.0165, 0.1712, 0.0993, -0.0499, 0.1879, 0.1096, -0.0663, -0.0252, 0.0588, -0.1307, 0.1953, 0.2352, -0.0426, -0.1273, 0.1197, 0.1465, -0.1644, -0.1344, -0.0665, 0.0288, 0.0984, -0.1501, -0.2083, 0.1518, 0.1839, 0.2225, 0.102, 0.1067, -0.0876, 0.1022, 0.0617, 0.2354, -0.0265, 0.0196, -0.0858, -0.2385, -0.1014, -0.1286, 0.1983, 0.0742, 0.0339, -0.014, -0.1062, 0.0597, -0.0614, -0.3472, -0.1149, -0.0247),
    (0.0377, 0.0344, 0.0532, 0.215, 0.1348, -0.079, 0.0318, 0.2112, 0.2492, 0.003, 0.0806, 0.1446, 0.0555, 0.0601, -0.0257, -0.1558, -0.0434, 0.1181, -0.144, 0.1844, -0.049, -0.2457, 0.1732, 0.2136, 0.0449, -0.169, 0.1574, -0.0254, 0.0144, -0.0752, 0.0326, -0.1805, 0.1496, -0.0464, 0.1367, -0.0541, 0.2335, -0.022, -0.1606, 0.2275, 0.0043, -0.1842, -0.1857, 0.0517, 0.0484, -0.1018, 0.1515, 0.0032, 0.0148, 0.1032, 0.1434, 0.0439, 0.0895, 0.1128, 0.0405, 0.0033, -0.0026, -0.2302, -0.0577, 0.137, 0.1679, 0.0528, 0.0714, -0.0176),
    (-0.0573, 0.005, 0.0925, -0.1555, 0.0192, -0.1704, 0.1254, -0.0706, -0.0681, 0.1416, -0.1809, -0.0456, -0.1821, 0.0692, -0.1316, 0.0387, -0.0044, -0.087, 0.0656, -0.0058, -0.115, -0.093, 0.0213, 0.0413, 0.3589, 0.022, -0.28, 0.0735, -0.1532, 0.2163, -0.0484, -0.0038, 0.0865, 0.1037, 0.0568, 0.0382, -0.1581, -0.0341, 0.0761, -0.0412, 0.0012, 0.0599, 0.0827, 0.0691, -0.158, -0.0624, 0.0903, -0.05, 0.0302, -0.2347, 0.2285, -0.0996, -0.0229, 0.152, 0.0735, -0.2374, 0.1018, -0.1535, -0.0028, 0.1249, -0.1806, -0.1168, 0.1575, -0.2013),
    (0.16, 0.1231, -0.2059, -0.2155, -0.0951, -0.0755, 0.0329, 0.0192, 0.0561, -0.0503, -0.0146, -0.0424, -0.049, -0.1114, -0.2945, -0.0134, 0.0773, -0.0773, 0.0183, -0.0969, -0.1468, 0.0099, -0.1898, 0.1323, -0.0615, 0.0951, -0.21, -0.0742, 0.0938, -0.1125, 0.0467, -0.036, -0.049, 0.1642, -0.3185, -0.1442, 0.0064, -0.0813, -0.0836, -0.0057, 0.064, -0.1088, -0.2011, 0.1065, 0.0237, -0.1113, 0.0747, -0.0434, 0.1209, 0.089, 0.2063, -0.3017, -0.0669, -0.048, -0.0163, 0.0445, 0.1946, 0.0398, -0.1433, 0.035, 0.1496, -0.0528, 0.178, -0.1545),
    (-0.1175, 0.0188, 0.0198, -0.0669, -0.2177, 0.0147, 0.0185, -0.2958, -0.021, 0.2533, -0.0357, -0.0856, 0.1505, 0.0418, 0.094, 0.1014, -0.1943, -0.1272, 0.0326, 0.0987, 0.1425, -0.0432, 0.1469, 0.1855, 0.0317, 0.0824, -0.2514, -0.127, 0.0437, 0.0074, 0.2641, -0.0336, 0.094, 0.0277, -0.0527, 0.037, 0.1, -0.0583, -0.162, -0.3124, 0.1177, -0.1072, -0.0825, -0.0432, 0.0279, -0.0187, 0.1319, -0.1518, 0.2906, -0.0441, -0.0473, -0.1075, 0.0315, -0.1142, -0.1684, -0.0498, -0.0003, -0.1049, -0.0891, -0.0078, 0.1025, 0.1338, -0.0576, -0.0599),
    (-0.0609, -0.0573, -0.1401, 0.2752, -0.0609, 0.0255, -0.1069, 0.1541, 0.1621, 0.0768, 0.1522, -0.0047, 0.087, -0.0943, -0.2745, 0.076, 0.1024, 0.1622, 0.0682, -0.0566, 0.0608, -0.1986, -0.1155, -0.0518, 0.0674, -0.1465, -0.2304, -0.0932, -0.0738, 0.0187, -0.0313, -0.0307, 0.0947, 0.0545, -0.0597, -0.1188, 0.0299, -0.0245, -0.0615, -0.1229, 0.0445, 0.0479, 0.0818, 0.0869, 0.1009, -0.0307, -0.0067, -0.3214, -0.1101, -0.2192, -0.2275, -0.1857, 0.1404, 0.0387, 0.0383, -0.2371, -0.0376, -0.2329, 0.0819, -0.0789, 0.035, 0.1416, 0.0829, 0.0283),
    (-0.0816, 0.0531, 0.2556, 0.2773, -0.0903, 0.0487, 0.0621, -0.0278, -0.0529, 0.1303, -0.1193, 0.0048, 0.0967, -0.0311, -0.1832, 0.037, -0.0832, -0.0406, 0.1432, 0.0065, -0.234, 0.0154, 0.0419, -0.1514, 0.057, -0.0626, -0.0156, -0.0418, -0.186, -0.128, 0.005, -0.0114, -0.0473, -0.1889, -0.0144, -0.1021, 0.105, 0.0153, -0.1287, 0.2286, 0.2348, -0.0874, 0.0811, -0.2323, -0.2337, -0.2366, 0.1504, -0.0023, -0.0758, -0.0685, 0.0917, 0.1092, -0.1555, -0.0085, -0.0495, -0.1498, -0.2064, 0.0498, 0.1295, 0.1013, -0.0954, -0.1018, -0.0735, 0.1509),
    (-0.0795, 0.0724, -0.0978, -0.0348, -0.0472, 0.0231, 0.0225, 0.0992, 0.0843, -0.0772, 0.0069, 0.0883, -0.1282, -0.3308, -0.0045, 0.0326, -0.1907, -0.0602, -0.0535, 0.0354, 0.0087, 0.0771, 0.058, -0.0284, -0.124, -0.1189, 0.1421, -0.0533, 0.0231, 0.0382, -0.2198, -0.0107, 0.0357, -0.2031, 0.2656, -0.2038, 0.1875, 0.2738, 0.1095, -0.0069, -0.1704, -0.032, 0.1665, 0.0686, 0.109, -0.0769, 0.1588, -0.1685, 0.1061, -0.1511, 0.0056, 0.0806, -0.1226, 0.0638, -0.098, 0.0956, 0.0055, -0.1087, 0.1737, 0.0375, 0.2432, 0.2186, 0.1399, 0.0208),
    (-0.0272, -0.1418, -0.1014, 0.0323, -0.0632, 0.0104, 0.2736, -0.067, 0.0294, -0.0867, -0.0317, 0.1501, 0.1593, -0.0352, 0.1277, 0.0697, 0.2198, -0.1028, -0.2208, -0.0529, -0.0512, 0.0466, 0.2486, -0.0671, 0.0515, -0.2077, -0.0386, -0.107, -0.0587, 0.0932, -0.0411, -0.1892, 0.0258, 0.2324, 0.0519, -0.0442, -0.0321, 0.107, -0.1116, -0.2056, -0.1373, 0.1192, 0.038, 0.1239, 0.1467, -0.1499, 0.0757, -0.3015, 0.0571, 0.2106, -0.0011, 0.0078, 0.2228, -0.1232, -0.1419, 0.0784, 0.0594, 0.0199, -0.0917, 0.0469, -0.0447, -0.0891, 0.051, -0.1788),
    (0.0274, 0.0308, 0.1853, 0.1789, -0.0067, -0.0082, -0.2657, 0.1706, -0.0885, 0.0639, 0.3395, 0.2545, 0.0719, 0.1467, -0.0414, 0.015, -0.0733, 0.0716, 0.0607, 0.0699, -0.0959, -0.103, -0.1108, 0.1212, -0.1278, 0.0407, 0.0612, 0.0587, -0.1422, -0.2084, 0.1117, 0.0603, 0.156, 0.0799, 0.1251, 0.0332, 0.2224, 0.0004, 0.1251, -0.1262, 0.1139, -0.1057, -0.0078, 0.0769, 0.1348, 0.039, -0.1789, 0.0746, 0.1355, -0.0133, -0.0959, 0.0775, 0.0399, 0.1322, 0.0774, 0.0238, -0.1178, 0.0181, -0.0008, -0.3549, -0.0275, 0.1208, 0.1001, -0.0098),
    (0.0228, 0.0653, 0.0305, -0.1551, 0.0562, 0.0105, 0.136, 0.1497, -0.1924, -0.1302, 0.1588, 0.1196, 0.0089, 0.2123, -0.0014, -0.1641, -0.1798, 0.1683, 0.1792, -0.1704, -0.1642, -0.195, -0.0788, -0.0169, 0.0743, 0.0436, 0.135, -0.2047, 0.0048, -0.0676, 0.133, 0.2263, 0.1451, 0.0293, -0.2647, 0.1771, -0.185, 0.1082, 0.0096, -0.1096, -0.0898, 0.013, -0.0973, -0.1054, 0.1069, -0.1101, 0.1754, 0.0525, -0.097, -0.045, -0.2126, 0.0887, 0.1311, 0.0547, 0.095, 0.0368, -0.0176, -0.0017, -0.0598, -0.08, -0.0546, -0.047, 0.0298, -0.2179),
    (-0.0932, -0.2249, 0.0218, -0.1579, -0.0206, -0.0215, -0.0439, -0.1147, -0.2152, 0.0829, 0.1588, 0.025, 0.0745, -0.0941, 0.1708, 0.0422, 0.164, -0.1718, -0.0855, -0.0915, 0.0495, 0.1409, -0.0149, 0.0493, 0.0526, -0.0213, -0.0051, 0.0921, 0.1285, 0.1192, 0.1232, -0.263, 0.0392, 0.0831, 0.1878, -0.1995, 0.0333, 0.0058, -0.1468, -0.0425, 0.082, -0.0407, 0.0504, 0.0228, 0.1259, -0.1771, -0.1948, 0.1008, -0.003, -0.0346, 0.0288, -0.0668, -0.0247, 0.3751, -0.0674, -0.2792, 0.0466, -0.1779, 0.0617, -0.0049, -0.0909, 0.1299, -0.2022, 0.0481),
)
IVF_PROBES = 4                  # cells probed per query

# --- corpus-composition operators (r4; SURVEY §2.G additions) -------------
# Line-level exact dedup (Lee et al. 2022 "Deduplicating Training Data
# Makes Language Models Better", the ExactSubstr/line-dedup family): the
# synthetic corpus has no newlines, so the "line" unit is a fixed
# non-overlapping word chunk — same machinery, deterministic segmentation.
LINE_DEDUP_WORDS = 8            # words per segment
# Benchmark decontamination (GPT-3 appendix C / PaLM style): flag training
# docs sharing any word n-gram with a held-out benchmark set. The
# benchmark here is the deterministic doc_id % mod == 0 slice.
DECONTAM_NGRAM = 8              # word n-gram width
DECONTAM_BENCH_MOD = 13         # benchmark = doc_id % 13 == 0
# DSIR importance resampling (Xie et al. 2023): hashed-ngram bag features,
# target = the same deterministic doc_id % mod == 0 slice decontamination
# uses as its held-out stand-in; raw = everything else.
DSIR_BUCKETS = 4096             # hashed-ngram feature buckets
DSIR_TOPK = 100                 # docs selected by Gumbel top-k

# --- quality-filter family (r6; operators/filtering.py) -------------------
# Gopher rules (Rae et al. 2021 Table A1). Thresholds calibrated on the
# sf0.01 corpus (words/doc 10-99 median 56, mean word length p05/p95 =
# 4.17/4.85, stopword count p25 = 2) so each gate is live but not empty;
# the symbol-ratio and dup-line rules are kept faithful to the recipe
# even though this punctuation-free synthetic corpus never trips them.
GOPHER_MIN_WORDS = 15
GOPHER_MAX_WORDS = 95
GOPHER_WORD_LEN_LO = 4.3
GOPHER_WORD_LEN_HI = 4.8
GOPHER_MAX_SYMBOL = 0.1
GOPHER_MIN_STOP = 2             # ≥2 of STOPWORDS, Gopher's stop-word test
GOPHER_MAX_TOP_WORD = 0.14      # = CURATION_MAX_TOP_WORD (≈ p90)
GOPHER_MAX_DUP_2GRAM = 0.06     # = CURATION_MAX_DUP_2GRAM (≈ p90)
GOPHER_MAX_DUP_LINE = 0.3
# C4 line rules (Raffel et al. 2020 §2.2) on the LINE_DEDUP_WORDS chunk
# segmentation: ≥5-word lines (drops short trailing chunks), 'dup' as
# the corpus's boilerplate marker (25/500 docs at sf0.01), ≥3 surviving
# lines per doc (449/500 docs pass).
C4_MIN_LINE_WORDS = 5
C4_BOILERPLATE = "dup"
C4_MIN_LINES = 3
# fastText-style hashed linear classifier: bucket count and integer
# weight scale (weights ∈ [-QC_SCALE, QC_SCALE] micro-units).
QC_BUCKETS = 1024
QC_SCALE = 1000
CCNET_BUCKETS = 3               # head / middle / tail tertiles
# Point-in-interval range join: every error event opens a 1-hour
# window (~14 events/window at the corpus's event rate).
INTERVAL_W_S = 3600.0
# Perceptual-hash near-dup over media thumbnails: dHash bits over the
# evenly-spaced byte samples the resize stub produces; banded buckets
# (simhash-style) generate candidates, exact Hamming distance decides.
PHASH_BITS = 16                 # dHash width = thumbnail samples (coarse:
                                # the decode stub's 16-sample thumbnail; a
                                # real codec path would use 64)
PHASH_BANDS = 4                 # 8-bit bands
PHASH_MAX_HAMMING = 2           # near-dup acceptance radius
# Exact substring dedup (Lee et al. 2022 §3.1, rolling-gram formulation):
# a token span is duplicated iff it is ≥ SUBSTR_L tokens and occurs at
# another position anywhere in the corpus (other doc OR same doc).
SUBSTR_L = 8                    # minimum duplicated span length, tokens
# Token-budget sequence packing (group docs into fixed-budget training
# sequences, greedy first-fit in doc_id order within each source).
PACK_BUDGET_TOKENS = 256
# Default doc_id-range width of a pack shard: bounds the Arrow batch one
# packing task materializes (a hot source at 100 TB is otherwise ONE
# unbounded task). Sequences never cross a shard boundary — the same
# contract as any epoch/file-split boundary. Sized so the sf0.01 oracle
# still exercises real multi-shard numbering (doc_ids span 0..499 → two
# shards) while sf0.1 packs in ~20×13 groups instead of the 640 that a
# 128-doc shard produced (each applyInPandas group pays a Python-worker
# round trip — measured 2.2 s vs 0.9 s at sf0.1 for identical output
# semantics); production tunes it to executor memory (docs_per_shard ×
# avg doc size ≲ a few hundred MB).
PACK_SHARD_DOCS = 384
# Stratified sampling / domain mixing: per-language keep rates, applied
# via a deterministic 60-bit hash so both engines draw the same sample.
SAMPLE_RATES = {"en": 0.25, "fr": 0.5, "de": 0.75, "es": 1.0, "zh": 0.1}
# Mixture planning (the step that PRODUCES sampling rates): target token
# share per language and a global training-token budget; languages absent
# from the target get share 0.
MIX_TARGET = {"en": 0.4, "fr": 0.2, "de": 0.2, "es": 0.15, "zh": 0.05}
MIX_BUDGET_TOKENS = 40_000
SAMPLE_SALT = "smp"
MIX_SALT = "mix"                # mixture-driven sampler's hash salt —
                                # distinct from SAMPLE_SALT so the two
                                # samplers' draws are independent
SAMPLE_DENOM = 1152921504606846976.0   # 2^60 as double
# Deterministic HyperLogLog (Flajolet et al. 2007, the HLL standard):
# p=9 -> m=512 registers over the 60-bit portable hash; the remaining
# 51 bits feed the leading-zero rank (max rank 52). Exact-integer
# register sum (scaled by 2^52) keeps the sketch bit-reproducible
# across engines and partitionings.
HLL_P = 9
HLL_M = 512                     # 2^p
HLL_RANK_BITS = 51              # 60 - p
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 512.0)
# alpha * m^2 * 2^52 precomputed once so the estimate is ONE division.
HLL_NUM_SCALED = HLL_ALPHA * 512.0 * 512.0 * 4503599627370496.0
# BM25 keyword retrieval (Robertson-Sparck Jones; k1/b at the standard
# Okapi defaults) over the documents table for a literal query.
BM25_QUERY = ("window", "merge", "stream")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20
# Count-Min Sketch heavy hitters (Cormode & Muthukrishnan 2005): d=4
# salted 60-bit hash rows, w=16 counters each — deliberately narrow so
# the 31-word synthetic vocabulary collides and the report shows real
# CMS overestimates against exact counts. All-integer counters keep the
# sketch bit-reproducible across engines.
CMS_D = 4
CMS_W = 16
CMS_SALTS = ("cms0", "cms1", "cms2", "cms3")
CMS_HH_FRAC = 0.02              # heavy hitter: estimate >= 2% of stream
# Bloom-filter decontamination: the fixed-size variant of the exact
# n-gram broadcast in `decontaminate`. m bits / k salted hashes over the
# same 8-gram stream; the membership structure is bounded by m (8 KiB of
# bits; here a <= m-row integer position table so the oracle is exact
# SQL) REGARDLESS of benchmark size — the property that makes it the
# 100 TB decontamination shape. m, k sized for ~1% theoretical FP at the
# synthetic benchmark's ~2k distinct 8-grams (k=(m/n)ln2 ~ 4 at m=2^15).
BLOOM_M = 1 << 15               # bit-array size
BLOOM_K = 4                     # salted hash probes per n-gram
BLOOM_SALTS = ("blm0", "blm1", "blm2", "blm3")
# MinHash containment contamination (Broder's containment coefficient
# |A∩B|/|A| with A = benchmark doc's n-gram set): catches an eval doc
# EMBEDDED in a larger training doc, which symmetric Jaccard dilutes
# below any fixed threshold. 5-grams overlap enough in the synthetic
# corpus for live pairs at tau = 0.5.
CONTAIN_NGRAM = 5
CONTAIN_TAU = 0.5
# Cross-source dedup: per-source trust ranking (curated-first). Lower
# rank wins; sources absent from the map rank last by name. Mirrors the
# "prefer curated over crawl" keep rule in multi-corpus merges.
SOURCE_RANK = {
    "src0": 0, "src1": 1, "src2": 2, "src3": 3, "src4": 4,
    "src5": 5, "src6": 6, "src7": 7, "src8": 8, "src9": 9,
}
SOURCE_RANK_DEFAULT = 99
# Curriculum packing: pack order within a (source, shard) group is the
# quality-classifier score DESCENDING (cleanest docs first), so early
# pack_ids form the early-curriculum slice. Same budget as
# pack_sequences; stage = pack_id tertile boundaries are downstream.
# Rolling per-user anomaly detection over events.value: trailing-window
# z-score on exact integer cents (value is cents-grid data), so the
# window sums are order-independent integers and the float z is one
# deterministic expression over them on either engine.
ANOM_W = 20                     # trailing window, rows
ANOM_MIN = 5                    # minimum prior rows before scoring
ANOM_Z = 3.0                    # |z| threshold
# Fixed-size deterministic per-group sample: k docs per source by
# salted-hash order (the fixed-COUNT complement of stratified_sample's
# fixed-RATE keep).
GROUP_SAMPLE_K = 5
GROUP_SAMPLE_SALT = "gsmp"
# Join-key skew diagnostics: top-N keys by frequency with share and
# ratio to the median key count.
SKEW_TOPK = 10
# Interpolated bigram LM (Jelinek-Mercer): P(w|prev) = LAMBDA·ML(w|prev)
# + (1-LAMBDA)·Laplace-unigram(w). Same micro-nat integer quantization
# as lm_score so per-doc sums are order-independent.
LM2_LAMBDA = 0.7
# Sampled dedup-recall gate (r7): deterministic doc_id-hash sample fed
# to BOTH dedup kernels so the recall measurement is runnable at any
# corpus size (the exact PPJoin kernel is superlinear on repetitive
# corpora — PERF_NOTES 10×-slope table). Pair-level decisions are
# unaffected by which OTHER docs are present (signatures/verification
# are per-doc/per-pair), so recall on a uniform doc sample is an
# unbiased estimate of pair recall. MOD=2 keeps ~1/4 of true pairs.
RECALL_SAMPLE_MOD = 2
RECALL_SAMPLE_SALT = "rs"
# sampled-GD classifier training (r9): salt for the deterministic
# doc_id-hash training sample, and the keep-1-in-mod default — 12
# epochs over 1/4 of the corpus ≈ 3 full-corpus passes of training
# I/O instead of 12, plus the one full scoring pass
QC_SAMPLE_SALT = "qcs"
QC_SAMPLE_MOD = 4
# PQ ADC chunking (r7): neighbor_id-range width of one codes chunk —
# the numpy scoring task's work unit (the dedup_embedding_cosine
# blocked-GEMM pattern). Each task holds CHUNK·m code ints + the
# bounded query set; sized so a chunk's LUT-gather saturates one core
# without approaching task memory (4096 codes × 8 subs × 8 B = 256 KB).
PQ_CHUNK = 4096
# n-gram novelty (r7): gram order for the first-occurrence novelty
# fraction; PMI collocation mining: rank floor and top-k size.
NOVELTY_NGRAM = 3
# Intake-gate novelty floor (plans/pipeline.py:corpus_pipeline_novelty):
# drop docs whose first-occurrence gram fraction falls below this —
# median novelty on the synthetic corpus is ~0.63, so 0.5 gates
# meaningfully without emptying the assembly.
NOVELTY_MIN = 0.5
PMI_TOPK = 25
PMI_MIN_COUNT = 5
# Temperature mixture sampling (Conneau & Lample 2019 / mT5): share_l
# proportional to p_l^alpha; alpha < 1 flattens toward uniform.
MIX_TEMPERATURE_ALPHA = 0.5

# Length-bucketed dynamic batching (length_batches): docs per training
# batch. Small enough that sf0.01's 500 docs yield ~30 batches/strategy.
LB_BATCH_DOCS = 16

# Trigram Jelinek-Mercer interpolation weight (lm_score_trigram):
# p3 = LM3_LAMBDA * ML-trigram + (1 - LM3_LAMBDA) * p2(bigram JM).
LM3_LAMBDA = 0.6
