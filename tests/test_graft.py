"""Driver-entry contract: the multi-chip train step compiles and runs on a
virtual device mesh (mirrors the external dryrun harness)."""

import jax


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(min(8, jax.device_count()))
