"""Framework-wide constants.

TPU-native re-expression of the reference constant table
(``samgraph/common/constant.h:33-109`` / ``constant.cc:23-42``): the binary
dataset file layout is kept byte-compatible so datasets converted by the
reference's ``datagen`` tooling drop straight into this framework.
"""

import numpy as np

# --- dataset binary layout (reference constant.cc:23-42) -------------------
META_FILE = "meta.txt"
FEAT_FILE = "feat.bin"
LABEL_FILE = "label.bin"
INDPTR_FILE = "indptr.bin"
INDICES_FILE = "indices.bin"
TRAIN_SET_FILE = "train_set.bin"
TEST_SET_FILE = "test_set.bin"
VALID_SET_FILE = "valid_set.bin"

PROB_TABLE_FILE = "prob_table.bin"
ALIAS_TABLE_FILE = "alias_table.bin"
PROB_PREFIX_TABLE_FILE = "prob_prefix_table.bin"

IN_DEGREE_FILE = "in_degrees.bin"
OUT_DEGREE_FILE = "out_degrees.bin"

CACHE_BY_DEGREE_FILE = "cache_by_degree.bin"
CACHE_BY_HEURISTIC_FILE = "cache_by_heuristic.bin"
CACHE_BY_DEGREE_HOP_FILE = "cache_by_degree_hop.bin"
CACHE_BY_FAKE_OPTIMAL_FILE = "cache_by_fake_optimal.bin"
CACHE_BY_RANDOM_FILE = "cache_by_random.bin"

# --- meta.txt keys (reference constant.h:58-66) ----------------------------
META_NUM_NODE = "NUM_NODE"
META_NUM_EDGE = "NUM_EDGE"
META_FEAT_DIM = "FEAT_DIM"
META_FEAT_DATA_TYPE = "FEAT_DATA_TYPE"
META_NUM_CLASS = "NUM_CLASS"
META_NUM_TRAIN_SET = "NUM_TRAIN_SET"
META_NUM_TEST_SET = "NUM_TEST_SET"
META_NUM_VALID_SET = "NUM_VALID_SET"

# --- id space --------------------------------------------------------------
# The reference uses uint32 ids with kEmptyKey = 0xffffffff
# (constant.h:75).  We use int32 ids (XLA-friendly) with the int32 max as the
# padding sentinel; it sorts after every valid id, which the sort-based
# frontier dedup relies on.
ID_DTYPE = np.int32
EMPTY_KEY = np.iinfo(np.int32).max  # 2147483647

# internal sampling-dispatch sentinel (NOT a reference SampleType): uniform
# WITH replacement — random-walk steps draw this way
# (cuda_sampling_random_walk.cu's per-walker ``curand % len``), while every
# uniform khop SampleType is without-replacement (ops/sampling.py docstring)
UNIFORM_WR = "uniform_wr"
EMPTY_LABEL = -1

# --- capacity planning -----------------------------------------------------
# Reference scales workspace allocations by 1.25 (constant.h:82).  We use the
# same headroom when calibrating static frontier capacities.
ALLOC_SCALE = 1.25
# Round calibrated capacities up to a multiple of the TPU lane count so padded
# shapes tile cleanly onto the VPU/MXU.
CAPACITY_ALIGN = 256

# --- env vars (reference constant.h:88-99 analogs) -------------------------
ENV_PROFILE_LEVEL = "XGNN_PROFILE_LEVEL"
ENV_LOG_LEVEL = "XGNN_LOG_LEVEL"
ENV_SANITY_CHECK = "XGNN_SANITY_CHECK"
ENV_DUMP_TRACE = "XGNN_DUMP_TRACE"
ENV_EMPTY_FEAT = "XGNN_EMPTY_FEAT"
ENV_FAKE_FEAT_DIM = "XGNN_FAKE_FEAT_DIM"
ENV_TRAIN_SET_PART = "XGNN_TRAIN_SET_PART"
ENV_LOG_NODE_ACCESS = "XGNN_LOG_NODE_ACCESS"

KILOBYTES = 1024
MEGABYTES = 1024 * 1024
GIGABYTES = 1024 * 1024 * 1024
