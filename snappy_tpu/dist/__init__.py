"""L3 distribution: device-mesh sharding of independent 64 KiB blocks.

Snappy is dictionary-free per block, so the only parallel axis is data
parallelism over blocks (SURVEY.md §2.3, §7.4): no parameter state is
ever broadcast; the cross-device steps are the per-block length
exclusive-scan and the ordered gather of outputs.
"""
