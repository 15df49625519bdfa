"""Driver-contract regression tests: entry() compiles, dryrun runs."""

import sys

import jax

sys.path.insert(0, "/root/repo")


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (4, 512, 512, 10)


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on failure


def test_dryrun_multichip_2():
    import __graft_entry__ as g

    g.dryrun_multichip(2)
