"""Command-line driver: same flags and output lines as the reference CLI
(reference: src/main.cpp:174-264 parseArg, :14-172 main/runPipeline) so runs
are drop-in comparable.

Usage:  python -m tpu_viterbi.cli -n 1000000 -s 5.5 -i s4 -m b32 -v
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from .chain import (AddNoise, ConvolutionalEncoder, RandBitGen,
                    SoftDecisionPacker, snr_to_sigma)
from .chain.decoder_element import ViterbiDecoder
from .config import (ChannelIn, CompMode, DecodeOut, DecoderConfig,
                     Metric)
from .utils.bits import count_bit_errors

_CHANNEL_NAMES = {"HARD": ChannelIn.HARD, "h": ChannelIn.HARD,
                  "SOFT4": ChannelIn.SOFT4, "s4": ChannelIn.SOFT4,
                  "SOFT8": ChannelIn.SOFT8, "s8": ChannelIn.SOFT8,
                  "SOFT16": ChannelIn.SOFT16, "s16": ChannelIn.SOFT16,
                  "FP32": ChannelIn.FP32, "f": ChannelIn.FP32}
_METRIC_NAMES = {"b16": Metric.M_B16, "b32": Metric.M_B32,
                 "f16": Metric.M_FP16}
_OUTPUT_NAMES = {"b16": DecodeOut.O_B16, "b32": DecodeOut.O_B32}
_COMP_NAMES = {"REG": CompMode.REG, "reg": CompMode.REG,
               "DPX": CompMode.DPX, "dpx": CompMode.DPX}

_CHANNEL_PRETTY = {ChannelIn.HARD: "Hard Decision",
                   ChannelIn.SOFT4: "4-bit Soft Decision",
                   ChannelIn.SOFT8: "8-bit Soft Decision",
                   ChannelIn.SOFT16: "16-bit Soft Decision",
                   ChannelIn.FP32: "32-bit Floating Point"}


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        prog="tpu_viterbi",
        description="TPU-native Viterbi decoder simulation chain")
    p.add_argument("-n", "--num", type=int, default=None,
                   help="message length (default 32000000)")
    p.add_argument("-s", "--snr", type=float, default=None,
                   help="SNR in dB (sigma = 10^(-SNR/5); default 15.0)")
    p.add_argument("-i", "--input", choices=sorted(_CHANNEL_NAMES),
                   default="HARD", help="input channel type")
    p.add_argument("-m", "--metric", choices=sorted(_METRIC_NAMES),
                   default="b32", help="metric type")
    p.add_argument("-o", "--output", choices=sorted(_OUTPUT_NAMES),
                   default="b32", help="output pack type")
    p.add_argument("-c", "--compMode", choices=sorted(_COMP_NAMES),
                   default="reg", help="computation mode")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("--seed", type=int, default=None,
                   help="fixed seed for deterministic runs")
    p.add_argument("--dec-len", default=None,
                   type=lambda s: s if s == "auto" else int(s),
                   help="output bits decoded per block (int, or 'auto' "
                        "for a message-size-aware choice that fills the "
                        "lane tile on small messages)")
    p.add_argument("--backend", choices=["auto", "pallas", "xla"],
                   default="auto")
    p.add_argument("--survivor", choices=["auto", "full", "window"],
                   default="auto",
                   help="Pallas survivor-buffer mode: 'window' = the "
                        "reference's one-pointer circular buffer "
                        "(viterbi.cu:99-100); 'auto' uses it when the "
                        "full store exceeds VMEM")
    p.add_argument("--time-mode", choices=["wall", "slope"], default="wall",
                   help="kernel-time measurement: 'wall' times each "
                        "dispatch (cudaEvent-style); 'slope' cancels fixed "
                        "dispatch latency by repeat-count differencing — "
                        "use on high-latency remote/dev backends")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="write a jax.profiler trace of the run to DIR "
                        "(the reference's -lineinfo/Nsight analog)")
    p.add_argument("--e2e-device", action="store_true",
                   help="run the whole chain (generate -> decode -> BER) "
                        "as one jitted program sharded over all local "
                        "devices; only the error count leaves the device "
                        "(sharding/simulate.py)")
    p.add_argument("--generator", choices=["auto", "pallas", "xla"],
                   default="auto",
                   help="with --e2e-device: in-graph workload generator — "
                        "'pallas' = fused counter-mode kernel "
                        "(chain/genkernel.py), 'xla' = element chain, "
                        "'auto' = pallas on TPU")
    p.add_argument("--decode-file", metavar="PATH", default=None,
                   nargs="+",
                   help="decode real packed channel stream(s) from PATH(s) "
                        "instead of simulating: raw little-endian words in "
                        "the getInputSize layout (int32 for HARD/SOFT*, "
                        "float32 for FP32; viterbi.cu:64-84), inputNum "
                        "derived from the file size exactly as the "
                        "reference adapter does (viterbiDF.h:190); several "
                        "files decode back to back through one decoder "
                        "(compiled executables cached per input size)")
    p.add_argument("--out-file", metavar="PATH", default=None,
                   help="with a single --decode-file: where to write the "
                        "packed decoded words (uint32 for -o b32, uint16 "
                        "for b16; default <decode-file>.dec)")
    p.add_argument("--emit-file", metavar="PATH", default=None,
                   help="simulation mode: also write the packed channel "
                        "stream the chain produced to PATH, in the exact "
                        "format --decode-file reads back")
    p.add_argument("--stream-words", type=int, default=None, metavar="N",
                   help="with --decode-file: decode in chunks of N packed "
                        "words through the streaming decoder "
                        "(decoder/streaming.py overlap-save carry) — "
                        "fixed host memory for arbitrarily long files, "
                        "bit-identical output to the one-shot decode; N "
                        "must be a multiple of 1024")
    return p.parse_args(argv)


def _stream_decode_one(args, cfg: DecoderConfig, path: str):
    """--decode-file --stream-words N: chunked decode of one file through
    the overlap-save streaming decoder (decoder/streaming.py) — fixed
    host memory at any file size, output bit-identical to the one-shot
    decode of the same stream (its push/flush framing contract).
    Returns (rc, decoded_bits)."""
    from .decoder.api import DEFAULT_DEC_LEN
    from .decoder.streaming import StreamingViterbi

    in_dtype = np.float32 if cfg.channel_in == ChannelIn.FP32 else np.int32
    sv = StreamingViterbi(cfg, dec_len=args.dec_len or DEFAULT_DEC_LEN,
                          backend=args.backend, survivor=args.survivor)
    out_path = args.out_file or path + ".dec"
    n_words = emitted_words = n_chunks = 0
    try:
        with open(path, "rb") as fi, open(out_path, "wb") as fo:
            while True:
                buf = np.fromfile(fi, dtype=in_dtype,
                                  count=args.stream_words)
                if buf.size == 0:
                    break
                n_words += buf.size
                n_chunks += 1
                out = sv.push(buf)
                out.tofile(fo)
                emitted_words += out.size
            out = sv.flush()
            out.tofile(fo)
            emitted_words += out.size
    except OSError as e:
        print(f"Error: cannot stream {path}: {e}", file=sys.stderr)
        return 1, 0
    m = cfg.get_message_len(n_words * cfg.enc_data_per_pack)
    if m <= 0:
        print(f"Error: {path} holds {n_words} words — no decodable bits "
              f"after the {cfg.extra_l}+{cfg.extra_r}-bit overlap-save "
              f"framing.", file=sys.stderr)
        return 1, 0
    if args.verbose:
        print(f"Input file: {path} ({n_words} words in {n_chunks} chunks "
              f"of {args.stream_words})")
    print("Decode executed.")
    print(f"Final results -> {emitted_words * cfg.bits_per_pack} bits "
          f"decoded to {out_path} "
          f"({emitted_words * (cfg.bits_per_pack // 8)} bytes)")
    return 0, emitted_words * cfg.bits_per_pack


def run_decode_file(args, cfg: DecoderConfig) -> int:
    """--decode-file: serve real decodes — read packed channel words,
    run the pre-compiled decoder, write packed output words.  The one
    mode with no simulated ground truth, so it reports size + kernel
    time instead of BEN/BER.  Several files decode back to back through
    ONE ViterbiTPU instance: its per-size executable cache (api.py
    _warm) means equal-sized files compile once — the serving posture
    of run_stream, file-at-a-time."""
    from .decoder.api import DEFAULT_DEC_LEN, ViterbiTPU

    in_dtype = np.float32 if cfg.channel_in == ChannelIn.FP32 else np.int32
    dec = ViterbiTPU(cfg, dec_len=args.dec_len or DEFAULT_DEC_LEN,
                     backend=args.backend, time_mode=args.time_mode,
                     survivor=args.survivor)

    if len(args.decode_file) > 1 and not args.stream_words:
        # equal-sized files queue back to back through run_stream
        # (sustained serving: dispatches pipeline, one trailing block)
        # instead of paying a blocking round trip per file
        raws = []
        for path in args.decode_file:
            try:
                raws.append(np.fromfile(path, dtype=in_dtype))
            except OSError as e:
                print(f"Error: cannot read {path}: {e}", file=sys.stderr)
                return 1
        if len({r.shape[0] for r in raws}) == 1:
            input_num = raws[0].shape[0] * cfg.enc_data_per_pack
            m = cfg.get_message_len(input_num)
            if m <= 0:
                print(f"Error: {args.decode_file[0]} holds "
                      f"{raws[0].shape[0]} words — no decodable bits after "
                      f"the {cfg.extra_l}+{cfg.extra_r}-bit overlap-save "
                      f"framing.", file=sys.stderr)
                return 1
            outs, per = dec.run_stream(raws, input_num,
                                       want_time=args.verbose)
            for path, out in zip(args.decode_file, outs):
                out.tofile(path + ".dec")
                print("Decode executed.")
                print(f"Final results -> {m} bits decoded to {path}.dec "
                      f"({out.nbytes} bytes)")
            if args.verbose and per:
                gbps = m / per / 1e9
                line = (f"{len(outs)} files queued back to back: "
                        f"{per * 1e3:.3f} ms/file sustained "
                        f"({gbps:.3f} Gb/s)")
                if gbps > 25.0:
                    line += ("  [beyond the single-chip credibility bound "
                             "— async dispatch]")
                print(line)
            return 0
        del raws   # mixed sizes: fall through to the per-file loop

    total_bits = 0
    for path in args.decode_file:
        if args.stream_words:
            rc, bits = _stream_decode_one(args, cfg, path)
            if rc != 0:
                return rc
            total_bits += bits
            continue
        try:
            raw = np.fromfile(path, dtype=in_dtype)
        except OSError as e:
            print(f"Error: cannot read {path}: {e}", file=sys.stderr)
            return 1
        # inputNum = packed words x values-per-word (viterbiDF.h:190)
        input_num = raw.shape[0] * cfg.enc_data_per_pack
        m = cfg.get_message_len(input_num)
        if m <= 0:
            print(f"Error: {path} holds {raw.shape[0]} words "
                  f"({input_num} encoded bits) — no decodable bits after "
                  f"the {cfg.extra_l}+{cfg.extra_r}-bit overlap-save "
                  f"framing.", file=sys.stderr)
            return 1
        if args.verbose:
            print(f"Input file: {path} ({raw.shape[0]} words, "
                  f"{input_num} encoded bits, {m} message bits)")
        out, kernel_s = dec.run(raw, input_num)
        out_path = args.out_file or path + ".dec"
        out.tofile(out_path)
        if args.verbose and kernel_s is not None:
            # reference kernel-time pretty-print (viterbiDF.h:197-208)
            ms = kernel_s * 1e3
            t = (f"{ms * 1e3:.3f} us" if ms < 1.0 else
                 f"{ms:.3f} ms" if ms < 1000.0 else f"{ms / 1e3:.3f} s")
            gbps = m / kernel_s / 1e9
            line = f"Kernel time: {t}  ({gbps:.3f} Gb/s)"
            if gbps > 25.0:
                # bench.py's single-chip credibility bound: a wall time
                # implying this is an async-dispatch artifact (relay
                # backends where block_until_ready returns early)
                line += ("  [beyond the single-chip credibility bound — "
                         "async dispatch; use --time-mode slope]")
            print(line)
        print("Decode executed.")
        print(f"Final results -> {m} bits decoded to {out_path} "
              f"({out.nbytes} bytes)")
        total_bits += m
    if len(args.decode_file) > 1 and args.verbose:
        print(f"{len(args.decode_file)} files, {total_bits} bits total")
    return 0


def run_e2e_device(args, cfg: DecoderConfig) -> int:
    """--e2e-device: the fully in-graph sharded simulation. Same final
    output lines as the pipeline path."""
    import time

    import jax

    from .decoder.api import DEFAULT_DEC_LEN
    from .sharding.mesh import make_block_mesh
    from .sharding.simulate import build_sharded_simulation

    mesh = make_block_mesh()
    fn, m = build_sharded_simulation(
        cfg, args.num, mesh, snr_db=args.snr, scale=40000.0,
        dec_len=args.dec_len or DEFAULT_DEC_LEN, survivor=args.survivor,
        generator=args.generator)
    seed = args.seed if args.seed is not None else \
        int(np.random.SeedSequence().entropy % (2 ** 31))
    t0 = time.time()
    ben = int(jax.block_until_ready(fn(jax.random.PRNGKey(seed))))
    t1 = time.time()
    if args.verbose:
        n_dev = len(mesh.devices.flat)
        print(f"\nIn-graph chain over {n_dev} device(s): {m} bits decoded")
        print(f"  - first call (includes compile): {t1 - t0:.2f} s")
        t0 = time.time()
        ben2 = int(jax.block_until_ready(fn(jax.random.PRNGKey(seed + 1))))
        dt = time.time() - t0
        print(f"  - steady-state per call: {dt * 1e3:.1f} ms "
              f"({m / dt / 1e9:.3g} Gb/s e2e)   [BEN {ben2}]\n")
    print("Pipeline executed.")
    print(f"Final results -> BEN: {ben}   BER: {ben / args.num:g}")
    return 0


def run_pipeline(message_len: int, snr: float, cfg: DecoderConfig,
                 verbose: bool = False, seed=None, dec_len=None,
                 backend: str = "auto", time_mode: str = "wall",
                 survivor: str = "auto", emit_file=None):
    """Build and run the full chain; returns (BEN, pipeline, decoded_words).
    (reference: main.cpp:119-172 runPipeline)"""
    if seed is None:
        seed = int(np.random.SeedSequence().entropy % (2 ** 31))
    kwargs = {"dec_len": dec_len} if dec_len else {}
    rand_gen = RandBitGen(message_len, seed=seed)
    conv_enc = ConvolutionalEncoder()
    noise = AddNoise(snr_to_sigma(snr), seed=seed + 1)
    packer = SoftDecisionPacker(cfg.channel_in, scale=40000.0)
    viterbi = ViterbiDecoder(cfg, backend=backend, time_mode=time_mode,
                             survivor=survivor, **kwargs)

    if emit_file:
        packer.probe()   # capture the packed stream mid-pipeline
    pipe = rand_gen.probe() | conv_enc | noise | packer | viterbi
    result = pipe.run()
    if emit_file:
        # raw little-endian words in the getInputSize layout — exactly
        # what --decode-file reads back (probed_outputs[1]: the packer
        # sits after the probed source)
        np.asarray(result.probed_outputs[1]).tofile(emit_file)

    if verbose:
        print()
        pipe.print_status()
        print()

    decoded = np.asarray(result.final_output)
    gen_bits = np.asarray(result.probed_outputs[0])
    ben = count_bit_errors(decoded, cfg.bits_per_pack, gen_bits, cfg.extra_l)
    return ben, pipe, decoded


def main(argv=None) -> int:
    args = parse_args(argv)
    cfg_fields = dict(channel_in=_CHANNEL_NAMES[args.input],
                      metric=_METRIC_NAMES[args.metric],
                      decode_out=_OUTPUT_NAMES[args.output],
                      comp_mode=_COMP_NAMES[args.compMode])

    # runtime validity checks with the reference's error strings
    # (main.cpp:26-41)
    ci, mt = cfg_fields["channel_in"], cfg_fields["metric"]
    # These mirror config.options_valid on purpose, exactly as the
    # reference duplicates OptionsValid as runtime guards (main.cpp:26-41):
    # each invalid combo gets the reference's error string;
    # config.DecoderConfig would raise the same rejection generically
    # (tests assert the two stay in sync).
    if mt == Metric.M_B16 and ci == ChannelIn.SOFT16:
        print("Error: 16-bit metric does not support 16-bit soft decision "
              "input.", file=sys.stderr)
        return -1
    if mt == Metric.M_FP16 and ci == ChannelIn.SOFT16:
        print("Error: fp16 metric does not support 16-bit soft decision "
              "input.", file=sys.stderr)
        return -1
    if mt == Metric.M_FP16 and ci == ChannelIn.SOFT8:
        print("Error: fp16 metric does not support 8-bit soft decision "
              "input.", file=sys.stderr)
        return -1
    if mt == Metric.M_FP16 and cfg_fields["comp_mode"] == CompMode.DPX:
        print("Error: fp16 metric does not support DPX computation mode.",
              file=sys.stderr)
        return -1

    cfg = DecoderConfig(**cfg_fields)

    if args.decode_file:
        # file mode is a real decode — the simulation knobs make no sense
        # here; reject rather than silently ignore (OptionsValid
        # philosophy, viterbi.h:22-41)
        for bad, flag in ((args.num is not None, "-n/--num"),
                          (args.snr is not None, "-s/--snr"),
                          (args.seed is not None, "--seed"),
                          (args.emit_file is not None, "--emit-file"),
                          (args.e2e_device, "--e2e-device"),
                          (args.generator != "auto", "--generator")):
            if bad:
                print(f"Error: {flag} is not applicable with --decode-file "
                      "(the file IS the channel stream).", file=sys.stderr)
                return -1
        if args.out_file is not None and len(args.decode_file) > 1:
            print("Error: --out-file takes a single output path; with "
                  "several --decode-file inputs each writes <file>.dec.",
                  file=sys.stderr)
            return -1
        if args.stream_words is not None:
            if args.stream_words <= 0 or args.stream_words % 1024:
                print("Error: --stream-words must be a positive multiple "
                      "of 1024 (whole-pack alignment across chunks for "
                      "every channel width).", file=sys.stderr)
                return -1
            if args.time_mode != "wall":
                print("Error: --time-mode is not applicable with "
                      "--stream-words (chunked decodes are not "
                      "individually timed).", file=sys.stderr)
                return -1
    elif args.stream_words is not None:
        print("Error: --stream-words requires --decode-file.",
              file=sys.stderr)
        return -1
    elif args.out_file is not None:
        print("Error: --out-file requires --decode-file (simulation mode "
              "verifies in memory; use --emit-file to dump its packed "
              "stream).", file=sys.stderr)
        return -1
    if args.num is None:
        args.num = 32_000_000        # reference default (main.cpp:176)
    if args.snr is None:
        args.snr = 15.0              # reference default (main.cpp:177)

    if not args.decode_file and cfg.get_message_len(2 * args.num) <= 0:
        print(f"Error: message length {args.num} too short — no decodable "
              f"bits after the {cfg.extra_l}+{cfg.extra_r}-bit overlap-save "
              f"framing.", file=sys.stderr)
        return 1

    if args.verbose:
        if not args.decode_file:
            print(f"Message Length: {args.num}")
            print(f"SNR: {args.snr} dB")
        print(f"Input Channel Type: {_CHANNEL_PRETTY[cfg.channel_in]}")
        metric_pretty = {"M_B16": "16-bit", "M_B32": "32-bit",
                         "M_FP16": "FP16"}[cfg.metric.name]
        print(f"Metric Type: {metric_pretty}")
        out_pretty = "16-bit" if cfg.decode_out == DecodeOut.O_B16 else "32-bit"
        print(f"Output Type: {out_pretty}")
        comp_pretty = "Regular" if cfg.comp_mode == CompMode.REG else "DPX"
        print(f"Computation Mode: {comp_pretty}")
        print()

    # flag interplay (VERDICT r3 item 6): the in-graph path has no per-
    # element backend/time-mode knobs — reject rather than silently ignore;
    # conversely --generator only exists in-graph
    if args.e2e_device:
        if args.backend != "auto":
            print("Error: --backend is not applicable with --e2e-device "
                  "(the in-graph simulation selects its decode kernel via "
                  "--survivor / VMEM fit).", file=sys.stderr)
            return -1
        if args.time_mode != "wall":
            print("Error: --time-mode is not applicable with --e2e-device "
                  "(use -v for steady-state per-call timing).",
                  file=sys.stderr)
            return -1
    elif args.generator != "auto":
        print("Error: --generator requires --e2e-device (the pipeline path "
              "always uses the host element chain).", file=sys.stderr)
        return -1
    if args.survivor == "window" and args.backend == "xla":
        # the one-pointer circular buffer lives in the Pallas kernel; an
        # explicit window request the XLA core cannot honor fails loudly
        # (VERDICT r4 item 4; api.py raises the same on a resolved XLA
        # fallback, caught below)
        print("Error: --survivor window requires the Pallas kernel path; "
              "--backend xla cannot honor it.", file=sys.stderr)
        return -1

    import contextlib
    if args.profile:
        import jax
        trace_cm = jax.profiler.trace(args.profile)
    else:
        trace_cm = contextlib.nullcontext()
    from .config import ConfigResolutionError
    if args.e2e_device:
        try:
            with trace_cm:
                return run_e2e_device(args, cfg)
        except ConfigResolutionError as e:
            print(f"Error: {e}", file=sys.stderr)
            return -1
    try:
        with trace_cm:
            if args.decode_file:
                return run_decode_file(args, cfg)
            ben, _, _ = run_pipeline(args.num, args.snr, cfg,
                                     verbose=args.verbose, seed=args.seed,
                                     dec_len=args.dec_len,
                                     backend=args.backend,
                                     time_mode=args.time_mode,
                                     survivor=args.survivor,
                                     emit_file=args.emit_file)
    except ConfigResolutionError as e:
        # unhonorable flag combinations resolved at build time (e.g.
        # --survivor window on a backend=auto run that falls back to the
        # XLA core off-TPU) — reference-style error line, not a traceback.
        # Deliberately NOT a blanket ValueError: any other error is a real
        # bug and must keep its traceback (code-review r5 finding).
        print(f"Error: {e}", file=sys.stderr)
        return -1
    ber = ben / args.num

    print("Pipeline executed.")
    print(f"Final results -> BEN: {ben}   BER: {ber:g}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
