"""Unit tests for multi-step dispatch sizing (training/dispatch.py): K must
divide every event cadence, blocks must align to step boundaries, and
sharded loaders' epoch rotations must never be straddled."""

from contrad_tpu.training.dispatch import block_size, resolve_steps_per_dispatch


class _FakeLoader:
    def __init__(self, until=10**9):
        self._until = until

    def steps_until_rotation(self):
        return self._until


def test_auto_k_divides_all_cadences():
    # gcd(50, 2000, 100000) = 50 -> largest divisor <= 16 is 10
    assert resolve_steps_per_dispatch(0, True, 0, 50, 2000, 100000) == 10
    # gcd(160, 1600) = 160 -> capped at 16
    assert resolve_steps_per_dispatch(0, True, 0, 160, 1600) == 16
    # prime cadence: no divisor but 1
    assert resolve_steps_per_dispatch(0, True, 0, 7, 2000) == 1


def test_explicit_k_is_clamped_to_a_divisor():
    assert resolve_steps_per_dispatch(16, True, 0, 50, 2000) == 2  # gcd(50,16)
    assert resolve_steps_per_dispatch(10, True, 0, 50, 2000) == 10
    assert resolve_steps_per_dispatch(1, True, 0, 50, 2000) == 1


def test_disabled_paths():
    assert resolve_steps_per_dispatch(0, False, 0, 50) == 1  # no fused gather
    assert resolve_steps_per_dispatch(0, True, 5, 50) == 1   # tracing


def test_block_alignment_and_tail():
    ld = _FakeLoader()
    assert block_size(1, 4, 100, ld) == 4      # aligned
    assert block_size(5, 4, 100, ld) == 4
    assert block_size(3, 4, 100, ld) == 1      # misaligned -> single
    assert block_size(97, 4, 100, ld) == 4     # exactly fits [97..100]
    assert block_size(98, 4, 100, ld) == 1     # would overshoot max_steps


def test_block_respects_epoch_rotation():
    assert block_size(1, 4, 100, _FakeLoader(until=3)) == 1
    assert block_size(1, 4, 100, _FakeLoader(until=4)) == 4
    assert block_size(1, 4, 100, _FakeLoader(until=0)) == 1
    # loaders without rotation (replicated datasets) block freely
    assert block_size(1, 4, 100, object()) == 4


def test_event_coverage_over_a_simulated_run():
    """Walk the CLI loop structure: every print/eval step must land on a
    block end (or a single step), with a mid-run rotation forcing singles."""
    k, print_every, max_steps = 10, 50, 200
    rotation_at = 73  # next_indices() rotates when crossing this step
    fired, step = [], 1
    while step <= max_steps:
        until = max(0, rotation_at - step)
        b = block_size(step, k, max_steps, _FakeLoader(until=until))
        step += b - 1
        if step % print_every == 0:
            fired.append(step)
        step += 1
    assert fired == [50, 100, 150, 200]
