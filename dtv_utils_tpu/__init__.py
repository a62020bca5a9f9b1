"""dtv_utils_tpu — a TPU-native digital-television transmit & analysis framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of drmpeg/dtv-utils
(reference mounted at /root/reference): DVB-T / DVB-T2 / ITU-T J.83B transmit
chains, PAPR/CCDF IQ analysis, and exact vectorized rate oracles for
DVB-T/S2/S2X/T2 and ATSC 3.0, plus native C++ stream analyzers.

Design principles (TPU-first, not a port):
  * All FEC over GF(2^m) is expressed as GF(2) bit-plane linear algebra so the
    hot encode path is an int8 matmul on the MXU, not a byte-serial LFSR.
  * All interleavers are precomputed static gathers; stream carry-state is a
    small pytree exchanged between sequence shards via collectives.
  * OFDM symbols are batched through XLA's native FFT; pilots/TPS are static
    scatters fused by XLA.
  * The time axis shards across a `jax.sharding.Mesh`; everything per-symbol
    is embarrassingly parallel, and only carry-state/halos cross shards.
"""

__version__ = "0.1.0"
