"""Engine constants.

``CHAR_VECTOR`` / blank-index semantics reproduce the reference vocabulary
exactly (``/root/reference/config.py:2-6``): 94 printable chars, blank class
appended, ``NUM_CLASSES = 95``, ``BLANK_INDEX = 94``.

Physical caps mirror the reference's memory-bounding constants
(``/root/reference/DataPreprocess/DataGen.py:402-403``): they exist so one
pathological document cannot blow up a task at scale.
"""

# 94-character recognition vocabulary — byte-for-byte the reference's
# (/root/reference/config.py:2).
CHAR_VECTOR = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "-~`<>'.:;^/|!?$%#@&*()[]{}_+=,\\\""
)
NUM_CLASSES = len(CHAR_VECTOR) + 1  # 95
BLANK_INDEX = len(CHAR_VECTOR)  # 94

# Per-document node/block caps — the reference caps boxes per batch at 64 and
# line width at 384 px (/root/reference/DataPreprocess/DataGen.py:402-403);
# we cap DOM nodes and retained blocks per page for the same reason (skewed
# pathological pages must not dominate a task). Node cap is generous: real
# pages routinely carry tens of thousands of nodes.
MAX_NODES_PER_PAGE = 50_000
MAX_BLOCKS_PER_PAGE = 4_096
MAX_LINE_WIDTH = 384  # OCR strip pad width (reference max_box_width)
LINE_HEIGHT = 8  # OCR strip height (reference RoIRotate target height)

# Arc90-style scoring thresholds — analog of the reference's
# score_map_thresh=0.8 / box_thresh=0.1 (/root/reference/DetectUtil.py:127).
SCORE_THRESH = 0.8
BLOCK_THRESH = 0.1
MERGE_IOU_THRESH = 0.3  # nms_locality thres (/root/reference/locality_aware_nms.py:38)

# Text assembly policy (byte-identical contract): retained blocks are joined
# with exactly this separator, no leading/trailing whitespace added.
BLOCK_SEPARATOR = "\n\n"

# Write-side partition layout: crawl-date bucket + host hash + salt for hot
# hosts (north rule). SALT buckets bound the max rows a single hot host can
# put into one task at write time.
HOST_HASH_BUCKETS = 64
HOT_HOST_SALT = 8
