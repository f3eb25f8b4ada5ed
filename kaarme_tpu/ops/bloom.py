"""Two-stage Bloom prefilter (device side). Implemented in a later milestone.

TPU-native replacement for the reference's DoubleAtomicDoubleBloomFilter
(reference: include/double_bloomfilter.hpp:233-452).
"""
