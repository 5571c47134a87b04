"""Spec channel tests: lockstep prover/verifier roundtrips with challenge
equality asserts (mirrors channel/src/lib.rs:1246-1451 test strategy)."""

from stark_mlwe_tpu.spec import channel as ch
from stark_mlwe_tpu.spec.field import P
from stark_mlwe_tpu.spec.mle import MLE
from stark_mlwe_tpu.spec.rng import StdRng
from stark_mlwe_tpu.spec.transcript import Transcript


def rand_vec(n, seed):
    rng = StdRng.seed_from_u64(seed)
    return [rng.ark_fr_rand() for _ in range(n)]


def test_merkle_channel_lockstep():
    leaves = rand_vec(64, 1264)
    pchan = ch.ProverChannel(Transcript(b"T/MERKLE"))
    vchan = ch.VerifierChannel(Transcript(b"T/MERKLE"))
    cfg = ch.MerkleChannelCfg.new(2025)

    mp = ch.MerkleProver(pchan, cfg)
    root = mp.commit_vector(leaves)
    idx = [1, 5, 33]
    vals, proof = mp.open_indices(idx, leaves)
    cp = mp.challenge_scalar(b"post-open")

    mv = ch.MerkleVerifier(vchan, cfg)
    mv.receive_root(root)
    assert mv.verify_openings(idx, vals, proof)
    cv = mv.challenge_scalar(b"post-open")
    assert cp == cv, "prover/verifier transcripts must stay in lockstep"


def test_mle_commit_eval_lockstep():
    k = 5
    table = rand_vec(1 << k, 7)
    pchan = ch.ProverChannel(Transcript(b"T/MLE"))
    vchan = ch.VerifierChannel(Transcript(b"T/MLE"))
    cfg = ch.MerkleChannelCfg.new(99)

    mp = ch.MleProver(ch.MerkleProver(pchan, cfg), MLE(table))
    root = mp.commit()
    r_p = mp.draw_point(b"pt")
    val = mp.evaluate_and_bind(r_p)

    mv = ch.MleVerifier(ch.MerkleVerifier(vchan, cfg), k)
    mv.receive_root(root)
    r_v = mv.draw_point(b"pt")
    assert r_p == r_v
    mv.bind_claimed_eval(val)
    assert val == MLE(table).eval(r_v)


def test_plain_sumcheck_lockstep():
    k = 4
    table = rand_vec(1 << k, 42)
    pchan = ch.ProverChannel(Transcript(b"T/SC"))
    vchan = ch.VerifierChannel(Transcript(b"T/SC"))
    cfg = ch.MerkleChannelCfg.new(5)

    mp = ch.MleProver(ch.MerkleProver(pchan, cfg), MLE(table))
    root = mp.commit()
    sp = ch.SumCheckProver(mp)
    s = sp.send_claim()
    assert s == sum(table) % P

    mv = ch.MleVerifier(ch.MerkleVerifier(vchan, cfg), k)
    mv.receive_root(root)
    sv = ch.SumCheckVerifier(mv)
    sv.recv_claim(s)

    running = s
    rs = []
    for i in range(k):
        c0, c1, r_p = sp.round(i, b"sc/r")
        r_v, running = sv.round(i, running, c0, c1, b"sc/r")
        assert r_p == r_v
        rs.append(r_v)
    final = sp.finalize_and_bind_eval()
    sv.finalize_and_check(final, running)
    # Final value equals the MLE evaluated at the drawn point, low var first.
    assert final == MLE(table).eval(rs)


def test_mf_sumcheck_lockstep_with_offline_recompute():
    k = 4
    table = rand_vec(1 << k, 1369)
    pchan = ch.ProverChannel(Transcript(b"T/MF"))
    vchan = ch.VerifierChannel(Transcript(b"T/MF"))
    cfg = ch.MerkleChannelCfg.new(11)
    mcfg = ch.SumCheckMFConfig(queries_per_round=3)

    sp = ch.SumCheckMFProver(mcfg, cfg, pchan, MLE(table))
    sv = ch.SumCheckMFVerifier(mcfg, cfg, vchan, sp.current_root(), k)
    sv.receive_initial_root(sp.current_root())

    s = sp.send_claim()
    sv.recv_claim(s)

    running = s
    prev_root = sp.current_root()
    rs = []
    for i in range(k):
        c0, c1, r_p, next_root, op = sp.round(i)
        sv.start_round(i, running, c0, c1)
        r_v = sv.derive_round_challenge(i)
        assert r_p == r_v
        sv.recv_next_root(next_root)
        assert sv.verify_fold_openings(
            op.cur_indices, op.cur_values, op.cur_proof,
            op.next_indices, op.next_values, op.next_proof,
            r_v, prev_root, next_root)
        running = sv.compute_s_next(c0, c1, r_v)
        prev_root = next_root
        rs.append(r_v)
    final = sp.finalize_eval()
    sv.finalize_and_check(final, running)
    # offline recomputation cross-check of the final eval
    assert final == MLE(table).eval(rs)


def test_nizk_plain_roundtrip_and_tamper():
    k = 5
    witness = rand_vec(1 << k, 7)
    vk = ch.build_vk_plain(k, 2025)
    proof = ch.prove_plain(vk, witness)
    assert ch.verify_plain(vk, proof)
    assert proof.size_bytes() == 32 + 64 * k + 32

    # tamper a round coefficient
    bad = ch.ProofPlain(proof.root, list(proof.rounds), proof.final_eval)
    c0 = bytearray(bad.rounds[2][0])
    c0[0] ^= 1
    bad.rounds[2] = (bytes(c0), bad.rounds[2][1])
    assert not ch.verify_plain(vk, bad)

    # tamper the final eval
    bad2 = ch.ProofPlain(proof.root, list(proof.rounds),
                         bytes([proof.final_eval[0] ^ 1])
                         + proof.final_eval[1:])
    assert not ch.verify_plain(vk, bad2)


def test_nizk_mf_roundtrip_and_tamper():
    k = 4
    witness = rand_vec(1 << k, 8)
    vk = ch.build_vk_mf(k, 77, queries_per_round=3)
    proof = ch.prove_mf(vk, witness)
    assert ch.verify_mf(vk, proof)
    assert proof.size_bytes() > 0

    # tamper an opened value -> multiproof must fail
    r0 = proof.rounds[0]
    v = bytearray(r0.cur_values[0])
    v[0] ^= 1
    r0.cur_values[0] = bytes(v)
    assert not ch.verify_mf(vk, proof)
