"""tools/ab_aggregate.py: the multi-seed promotion rule.

The rule (documented in the tool): promote when the mean paired SWD
difference is below the BASELINE arm's own across-seed spread — which
covers both "no detectable difference" (|mean_d| < spread) and "candidate
better beyond seed noise" (mean_d < -spread) — with no catastrophic seed
(outside the baseline's observed support) and the candidate not
worse-by-more-than-spread in a majority of seeds; reject on systematic
worsening (mean_d > spread) or any catastrophic seed; otherwise stay
opt-in (underpowered).  The better-beyond-noise branch was added after the
round-4 shear regeneration fell through the old |mean_d| < spread test
despite being favorable (BASELINE.md, shear round-4 regeneration note).
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                'tools'))

from ab_aggregate import decide, load_pairs  # noqa: E402


def test_promote_when_diff_inside_seed_noise():
    # the shear study's actual numbers (BASELINE.md): mean paired diff
    # +0.0075 vs baseline spread 0.049 -> promote
    pairs = [(0.3447, 0.2766), (0.2881, 0.4004), (0.4001, 0.3875),
             (0.2622, 0.2999), (0.2933, 0.3795), (0.3186, 0.2079)]
    r = decide(pairs)
    assert r['verdict'] == 'promote'
    assert abs(r['mean_paired_diff'] - 0.0075) < 1e-3
    assert r['catastrophic_seeds'] == []


def test_promote_when_candidate_better_beyond_spread():
    # the round-4 shear regeneration's actual numbers (BASELINE.md): mean
    # paired diff -0.0678 vs baseline spread 0.0588 — better BEYOND seed
    # noise.  The pre-round-4 |mean_d| < spread rule dropped this to
    # keep-opt-in; the favorable tail must promote.
    pairs = [(0.2879, 0.2038), (0.4215, 0.3449), (0.4387, 0.2858),
             (0.3519, 0.3710), (0.3321, 0.2356), (0.4086, 0.3927)]
    r = decide(pairs)
    assert r['verdict'] == 'promote'
    assert r['mean_paired_diff'] < -r['base_seed_spread']
    assert r['catastrophic_seeds'] == []


def test_reject_systematically_worse():
    # candidate worse by ~3x the baseline's own spread in every seed
    pairs = [(0.30, 0.45), (0.32, 0.47), (0.28, 0.44), (0.31, 0.46)]
    r = decide(pairs)
    assert r['verdict'] == 'reject'
    assert r['mean_paired_diff'] > r['base_seed_spread']


def test_reject_single_catastrophic_seed():
    # mean diff ~0 but one candidate seed collapses far outside the
    # baseline's observed support
    pairs = [(0.30, 0.29), (0.32, 0.31), (0.28, 0.29), (0.31, 0.90)]
    r = decide(pairs)
    assert r['verdict'] == 'reject'
    assert r['catastrophic_seeds'] == [3]


def test_two_seeds_stay_opt_in():
    # n < 4 is underpowered by construction, even when both seeds improve
    pairs = [(0.34, 0.28), (0.29, 0.27)]
    assert decide(pairs)['verdict'] == 'keep-opt-in'


def test_single_seed_never_promotes_or_rejects():
    r = decide([(0.34, 0.28)])
    assert r['verdict'] == 'keep-opt-in'
    assert r['base_seed_spread'] is None


def test_load_pairs_scans_json_lines(tmp_path):
    log = tmp_path / 'ab.log'
    lines = [
        'noise line',
        json.dumps({'arm': 'gather', 'swd_mean': 0.34, 'train_seconds': 9}),
        json.dumps({'arm': 'shear', 'swd_mean': 0.28}),
        json.dumps({'verdict': 'shear_ok'}),          # no swd_mean: skipped
        json.dumps({'arm': 'gather', 'swd_mean': 0.29}),
        json.dumps({'arm': 'shear', 'swd_mean': 0.40}),
        json.dumps({'arm': 'gather', 'swd_mean': 0.31}),  # unpaired tail
    ]
    log.write_text('\n'.join(lines) + '\n')
    pairs = load_pairs([str(log)], 'gather', 'shear')
    assert pairs == [(0.34, 0.28), (0.29, 0.40)]


def test_load_pairs_drops_incomplete_seed_instead_of_mispairing(tmp_path):
    # seed 2's cand run crashed before printing: the base lines of seeds
    # 2 and 3 are adjacent.  Pairing must drop seed 2, not shift seed 3's
    # cand value onto seed 2's base (a cross-seed "paired" difference).
    log = tmp_path / 'ab.log'
    lines = [
        json.dumps({'arm': 'gather', 'swd_mean': 0.34}),
        json.dumps({'arm': 'shear', 'swd_mean': 0.28}),
        json.dumps({'arm': 'gather', 'swd_mean': 0.29}),  # seed 2: no shear
        json.dumps({'arm': 'gather', 'swd_mean': 0.31}),
        json.dumps({'arm': 'shear', 'swd_mean': 0.40}),
    ]
    log.write_text('\n'.join(lines) + '\n')
    pairs = load_pairs([str(log)], 'gather', 'shear')
    assert pairs == [(0.34, 0.28), (0.31, 0.40)]


def test_load_pairs_accepts_cand_before_base(tmp_path):
    log = tmp_path / 'ab.log'
    lines = [
        json.dumps({'arm': 'shear', 'swd_mean': 0.28}),
        json.dumps({'arm': 'gather', 'swd_mean': 0.34}),
    ]
    log.write_text('\n'.join(lines) + '\n')
    assert load_pairs([str(log)], 'gather', 'shear') == [(0.34, 0.28)]


def test_cli_end_to_end(tmp_path):
    log = tmp_path / 'ab.jsonl'
    rows = []
    for b, c in [(0.3447, 0.2766), (0.2881, 0.4004), (0.4001, 0.3875),
                 (0.2622, 0.2999), (0.2933, 0.3795), (0.3186, 0.2079)]:
        rows.append(json.dumps({'arm': 'gather', 'swd_mean': b}))
        rows.append(json.dumps({'arm': 'shear', 'swd_mean': c}))
    log.write_text('\n'.join(rows) + '\n')
    tool = os.path.join(os.path.dirname(__file__), os.pardir, 'tools',
                        'ab_aggregate.py')
    out = subprocess.run(
        [sys.executable, tool, str(log), '--base', 'gather',
         '--cand', 'shear'],
        capture_output=True, text=True, check=True)
    assert json.loads(out.stdout)['verdict'] == 'promote'
