"""Serving layer tests: opus codec round-trip, wire protocol, ws server
echo session, token SSE server + chat consumer."""

import asyncio
import os

import numpy as np
import pytest

from moss_speech_decoder_cosy_tpu.serving import protocol
from moss_speech_decoder_cosy_tpu.serving import opus as opus_mod


def test_protocol_roundtrip():
    msg = protocol.frame_message(protocol.KIND_TEXT, "hi".encode())
    kind, payload = protocol.parse_message(msg)
    assert kind == protocol.KIND_TEXT and payload == b"hi"
    x = np.sin(np.linspace(0, 10, 1920)).astype(np.float32)
    y = protocol.pcm16_decode(protocol.pcm16_encode(x))
    np.testing.assert_allclose(x, y, atol=1e-3)


@pytest.mark.skipif(not opus_mod.available(), reason="libopus missing")
def test_opus_roundtrip():
    sr = 24000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    enc = opus_mod.OpusEncoder(sr)
    dec = opus_mod.OpusDecoder(sr)
    data = enc.encode(x)
    assert len(data) > 0
    y = np.asarray(dec.decode(data), np.float32)
    assert len(y) == (len(x) // enc.frame) * enc.frame
    # opus is lossy + has codec delay; check energy is in the ballpark
    assert 0.1 < np.std(y[enc.frame:]) < 1.0


@pytest.mark.skipif(not opus_mod.available(), reason="libopus missing")
def test_opus_dtx_shrinks_silence():
    """DTX: silence frames become 1-2 byte no-data packets, so a mostly
    silent stream costs a fraction of the non-DTX bytes."""
    sr = 24000
    x = np.zeros(sr, np.float32)                  # 1 s of silence
    plain = sum(len(p) for p in
                opus_mod.OpusEncoder(sr).encode_packets(x))
    dtx_pkts = opus_mod.OpusEncoder(sr, dtx=True).encode_packets(x)
    dtx = sum(len(p) for p in dtx_pkts)
    assert dtx < plain / 3
    assert any(len(p) <= 2 for p in dtx_pkts)     # actual DTX packets


@pytest.mark.skipif(not opus_mod.available(), reason="libopus missing")
def test_opus_fec_recovers_lost_packet():
    """In-band FEC: with fec=True + loss_perc, a dropped packet is
    reconstructed from the following packet; PLC conceal() also yields a
    full frame when no FEC is available."""
    sr = 24000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    enc = opus_mod.OpusEncoder(sr, fec=True, loss_perc=20)
    pkts = enc.encode_packets(x)
    assert len(pkts) > 10
    dec = opus_mod.OpusDecoder(sr)
    out = []
    lost = 25
    for i, p in enumerate(pkts):
        if i == lost:
            continue                              # dropped on the wire
        if i == lost + 1:
            rec = dec.decode_fec(p, enc.frame)    # reconstruct lost frame
            assert len(rec) == enc.frame
            out.extend(rec)
        out.extend(dec.decode_packet(p))
    y = np.asarray(out, np.float32)
    assert len(y) == len(pkts) * enc.frame
    assert 0.1 < np.std(y[enc.frame:]) < 1.0      # still a real signal

    plc = dec.conceal(enc.frame)
    assert len(plc) == enc.frame
    assert np.isfinite(plc).all()


@pytest.mark.skipif(not opus_mod.available(), reason="libopus missing")
def test_opus_48k_coded_rate_roundtrip():
    """48 kHz input rate (the full coded band) round-trips with the same
    framing; bitrate/complexity knobs apply cleanly."""
    sr = 48000
    t = np.arange(sr // 2) / sr
    x = (0.4 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    enc = opus_mod.OpusEncoder(sr, bitrate=64000, complexity=5)
    dec = opus_mod.OpusDecoder(sr)
    y = np.asarray(dec.decode(enc.encode(x)), np.float32)
    assert len(y) == (len(x) // enc.frame) * enc.frame
    assert 0.05 < np.std(y[enc.frame:]) < 1.0


def test_ogg_crc_known_vector():
    # Ogg CRC (poly 0x04c11db7, init 0, no reflect, no xorout) is
    # CRC-32/POSIX without the final complement: POSIX check("123456789")
    # = 0x765E7680, so the raw register is its complement.
    from moss_speech_decoder_cosy_tpu.serving.ogg import ogg_crc
    assert ogg_crc(b"") == 0
    assert ogg_crc(b"123456789") == 0x765E7680 ^ 0xFFFFFFFF


def test_ogg_page_roundtrip_and_spanning():
    from moss_speech_decoder_cosy_tpu.serving.ogg import (
        OggPageWriter, OggPageReader)
    rng = np.random.RandomState(0)
    # sizes exercise: tiny, exactly 255 (needs empty terminal segment),
    # multi-segment, and > 255*255 (must span pages with CONTINUED)
    sizes = [1, 17, 255, 256, 1000, 255 * 255 + 123]
    packets = [bytes(rng.randint(0, 256, s, dtype=np.uint8))
               for s in sizes]
    w = OggPageWriter()
    data = w.page_out(packets[:3], granule=960)
    data += w.page_out(packets[3:], granule=1920, eos=True)
    assert data.startswith(b"OggS")

    r = OggPageReader()
    got = [p for p, _ in r.packets_in(data)]
    assert got == packets and r.eos

    # incremental byte-by-byte feeding yields the same packets
    r2 = OggPageReader()
    got2 = []
    for i in range(0, len(data), 7):
        got2.extend(p for p, _ in r2.packets_in(data[i: i + 7]))
    assert got2 == packets and r2.eos

    # corrupting one payload byte must trip the page CRC
    bad = bytearray(data)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError):
        OggPageReader().packets_in(bytes(bad))


def test_ogg_page_boundary_at_packet_edge():
    """A page that fills at exactly 255 segments ON a packet boundary must
    carry that packet's granule (not -1) and must NOT flag the next page
    CONTINUED (RFC 3533 §5-6)."""
    import struct
    from moss_speech_decoder_cosy_tpu.serving.ogg import (
        OggPageWriter, OggPageReader, CONTINUED)
    packets = [bytes([i % 256]) * 10 for i in range(255)] \
        + [b"x" * 7]                       # 255 one-seg packets + 1 more
    granules = [(i + 1) * 960 for i in range(len(packets))]
    w = OggPageWriter()
    data = w.page_out(packets, granules[-1], eos=True, granules=granules)

    # parse raw page headers
    pages = []
    off = 0
    while off < len(data):
        assert data[off:off + 4] == b"OggS"
        htype = data[off + 5]
        gran = struct.unpack("<q", data[off + 6: off + 14])[0]
        nseg = data[off + 26]
        body = sum(data[off + 27: off + 27 + nseg])
        pages.append((htype, gran, nseg))
        off += 27 + nseg + body
    assert pages[0][2] == 255                       # filled page
    assert pages[0][1] == granules[254]             # granule of pkt 255
    assert not (pages[1][0] & CONTINUED)            # fresh packet next

    r = OggPageReader()
    got = [p for p, _ in r.packets_in(data)]
    assert got == packets and r.eos


@pytest.mark.skipif(not opus_mod.available(), reason="libopus missing")
def test_ogg_opus_stream_roundtrip():
    from moss_speech_decoder_cosy_tpu.serving.ogg import (
        OggOpusWriter, OggOpusReader)
    sr = 24000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    w = OggOpusWriter(sr)
    data = w.encode(x) + w.flush()
    # standard container shape: BOS page carries OpusHead
    assert data.startswith(b"OggS") and b"OpusHead" in data[:64] \
        and b"OpusTags" in data[:200]
    r = OggOpusReader(sr)
    y = np.asarray(r.decode(data), np.float32)
    # decoded length = encoded frames minus the pre-skip priming samples
    pre = w.pre_skip * sr // 48000
    assert w.pre_skip > 0                  # real lookahead advertised
    assert len(y) >= (len(x) // w.enc.frame) * w.enc.frame - pre
    assert 0.1 < np.std(y[w.enc.frame:]) < 1.0
    assert r.pages.eos


@pytest.mark.skipif(not opus_mod.available(), reason="libopus missing")
def test_ws_server_ogg_codec_roundtrip():
    from moss_speech_decoder_cosy_tpu.serving.ws_server import (
        AudioWsServer, stream_wav)
    from aiohttp.test_utils import TestServer

    async def run():
        srv = AudioWsServer(handler=lambda s: s, codec="ogg", log=False)
        server = TestServer(srv.app)
        await server.start_server()
        url = str(server.make_url("/api/chat")).replace("http", "ws")
        # 440 Hz: opus VOIP mode high-pass filters very low frequencies
        n = protocol.FRAME_SAMPLES * 3
        t = np.arange(n) / protocol.SAMPLE_RATE
        x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        out = await stream_wav(url, x, codec="ogg", settle_s=0.5)
        await server.close()
        return x, out

    x, out = asyncio.run(run())
    # losses: the server only processes whole 1920-sample frames, plus
    # per-hop opus buffering and pre-skip trims (two ogg decode hops)
    assert len(out) >= len(x) - protocol.FRAME_SAMPLES - 2 * 480
    assert 0.1 < np.std(out[960:]) < 1.0


def test_ws_server_echo_roundtrip():
    from moss_speech_decoder_cosy_tpu.serving.ws_server import (
        AudioWsServer, stream_wav)
    from aiohttp.test_utils import TestServer, TestClient

    async def run():
        srv = AudioWsServer(handler=lambda s: s * 0.5, codec="pcm16",
                            log=False)
        server = TestServer(srv.app)
        await server.start_server()
        url = str(server.make_url("/api/chat")).replace("http", "ws")
        x = np.sin(np.linspace(0, 50, protocol.FRAME_SAMPLES * 3)
                   ).astype(np.float32) * 0.8
        out = await stream_wav(url, x, settle_s=0.5)
        await server.close()
        return x, out

    x, out = asyncio.run(run())
    assert len(out) == len(x)
    np.testing.assert_allclose(out, x * 0.5, atol=2e-3)


def test_token_sse_server_and_consumer():
    from moss_speech_decoder_cosy_tpu.serving.token_server import (
        TokenSSEServer, consume_sse)
    from aiohttp.test_utils import TestServer

    tokens = [5, 6, 7, 1005, 1006]

    async def run():
        srv = TokenSSEServer(lambda params: list(tokens))
        server = TestServer(srv.app)
        await server.start_server()
        url = str(server.make_url("/generate_stream"))
        got = []
        async for t in consume_sse(url, {"prompt": "x"}):
            got.append(t)
        await server.close()
        return got

    got = asyncio.run(run())
    assert got == tokens


def test_chat_audio_consumer_blocks():
    """ChatAudioConsumer demuxes text/audio and decodes ramping blocks."""
    import jax
    import jax.numpy as jnp
    from moss_speech_decoder_cosy_tpu.models.flow import (
        CausalMaskedDiffWithXvec)
    from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
    from moss_speech_decoder_cosy_tpu.pipeline import AudioDecoder
    from moss_speech_decoder_cosy_tpu.serving.token_server import (
        ChatAudioConsumer)
    from moss_speech_decoder_cosy_tpu.utils.config import (
        tiny_flow_config, tiny_hift_config, PipelineConfig)

    flow_cfg, hift_cfg = tiny_flow_config(), tiny_hift_config()
    flow = CausalMaskedDiffWithXvec(flow_cfg)
    fp = flow.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                   jnp.ones((1, 8), bool),
                   jnp.zeros((1, 0, flow_cfg.output_size)),
                   jnp.zeros((1, flow_cfg.spk_embed_dim)))
    hift = HiFTGenerator(hift_cfg)
    hp = hift.init(jax.random.PRNGKey(1),
                   jnp.zeros((1, 8, hift_cfg.in_channels)))
    dec = AudioDecoder(flow_cfg, hift_cfg, fp, hp, PipelineConfig())

    consumer = ChatAudioConsumer(dec, audio_offset=1000, end_token_id=9999)
    consumer.BLOCK_SIZES = (4, 8)                       # tiny ramp
    rng = np.random.RandomState(0)
    # interleave 3 text tokens and 10 audio tokens
    stream = [1, 2, 3] + [1000 + t for t in rng.randint(0, 64, 10)]
    for t in stream:
        consumer.push(int(t))
    wav = consumer.finish()
    assert consumer.text_tokens == [1, 2, 3]
    frame = hift_cfg.total_upsample
    assert wav.shape == (1, 10 * dec.ratio * frame)


def test_audio_stream_processor_cuts_at_silence():
    from moss_speech_decoder_cosy_tpu.serving.audio_process import (
        AudioStreamProcessor)
    sr = 24000
    p = AudioStreamProcessor(sr=sr, min_chunk_seconds=0.25)
    t = np.arange(sr // 2) / sr
    loud = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    silent = np.zeros(sr // 4, np.float32)
    assert p.push(loud[: sr // 8]) is None          # below min chunk
    chunk = p.push(np.concatenate([loud[sr // 8:], silent]))
    assert chunk is not None and len(chunk) >= int(sr * 0.25)
    # the cut lands inside the silent region
    assert np.abs(chunk[-1]) < 0.05
    rest = p.flush()
    assert len(chunk) + len(rest) == len(loud) + len(silent)


def test_latency_stats():
    from moss_speech_decoder_cosy_tpu.utils.profiling import LatencyStats
    st = LatencyStats()
    import time as _t
    for _ in range(3):
        with st.measure("step"):
            _t.sleep(0.001)
    s = st.summary()["step"]
    assert s["n"] == 3 and s["mean_ms"] >= 1.0


def test_web_demo_page_serves():
    from moss_speech_decoder_cosy_tpu.serving.web_demo import WebDemo
    from aiohttp.test_utils import TestServer
    import aiohttp

    async def run():
        demo = WebDemo(handler=lambda s: s)
        server = TestServer(demo.ws.app)
        await server.start_server()
        async with aiohttp.ClientSession() as s:
            async with s.get(server.make_url("/")) as resp:
                assert resp.status == 200
                text = await resp.text()
        await server.close()
        return text

    text = asyncio.run(run())
    assert "websocket" in text or "WebSocket" in text


def test_native_audio_kernels():
    from moss_speech_decoder_cosy_tpu import native
    assert native.available(), "g++ toolchain expected in this image"
    rng = np.random.RandomState(0)
    x = (rng.randn(4096) * 0.5).astype(np.float32)
    data = native.pcm16_encode(x)
    y = native.pcm16_decode(data)
    np.testing.assert_allclose(y, np.clip(x, -1, 1), atol=1e-3)
    # crossfade equals the numpy formula
    n = 256
    head = rng.randn(n).astype(np.float32)
    tail = rng.randn(n).astype(np.float32)
    win = np.hamming(2 * n).astype(np.float32)
    got = native.crossfade(head, tail, win[:n], win[n:])
    want = head * win[:n] + tail * win[n:]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_compare_handler_and_demo_page():
    """Streaming-vs-offline A/B surface (web_demo make_compare_handler):
    both modes run over the same input with timing + RTF, and the demo
    page exposes the mic client and compare UI."""
    import asyncio
    import numpy as np
    from moss_speech_decoder_cosy_tpu.serving import web_demo as wd

    class FakeCodec:
        def convert_voice(self, wav16, prompt, streaming=False):
            return (wav16[None, :] * (0.5 if streaming else 1.0))[
                :, : 24000]

    h = wd.make_compare_handler(FakeCodec(), prompt=None)
    wav = np.random.RandomState(0).randn(24000).astype(np.float32) * 0.1
    res = h(wav)
    assert set(res) == {"offline", "streaming"}
    for v in res.values():
        assert v["seconds"] >= 0 and v["rtf"] >= 0
        assert v["wav"].ndim == 1
    b64 = wd._wav_b64(res["offline"]["wav"], 24000)
    assert isinstance(b64, str) and len(b64) > 100

    page = wd._PAGE % {"sr": 24000, "frame": 1920}
    for needle in ("getUserMedia", "api/compare", "id=\"mic\"",
                   "id=\"ab\"", "id=\"prep\""):
        assert needle in page, needle


def test_compare_handler_prompt_prep_flag():
    """prep=True re-prepares the prompt per request like the reference
    demo (loudest reference_ratio*min(dur,10s) segment, RMS matched to
    the input, gradio_voice_converter_unstreaming.py:385-408); prep=False
    uses the prebuilt prompt."""
    import numpy as np
    from moss_speech_decoder_cosy_tpu.serving import web_demo as wd
    from moss_speech_decoder_cosy_tpu.codec import calculate_rms

    seen = {"prompts": [], "prep_args": None}

    class FakeCodec:
        def prepare_prompt(self, w24, w16, pick_loudest_seconds=None,
                           target_rms=None):
            seen["prep_args"] = (pick_loudest_seconds, target_rms)
            return "prepped"

        def convert_voice(self, wav16, prompt, streaming=False):
            seen["prompts"].append(prompt)
            return wav16[None, :24000]

    rng = np.random.RandomState(1)
    w24 = rng.randn(9600).astype(np.float32) * 0.1
    w16 = rng.randn(6400).astype(np.float32) * 0.1
    wav = rng.randn(24000).astype(np.float32) * 0.1
    h = wd.make_compare_handler(FakeCodec(), prompt="raw",
                                prompt_wavs=(w24, w16))
    h(wav, prep=False)
    assert seen["prompts"] == ["raw", "raw"]
    seen["prompts"].clear()
    h(wav, prep=True)
    assert seen["prompts"] == ["prepped", "prepped"]
    dur, rms = seen["prep_args"]
    assert abs(dur - 0.8 * (6400 / 16000)) < 1e-9
    assert abs(rms - calculate_rms(wav)) < 1e-9


def test_multi_stream_manager_matches_standalone_sessions():
    """MultiStreamManager: per-stream knobs (block size/window/prompt),
    lifecycle isolation, output identical to a standalone StreamSession."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from moss_speech_decoder_cosy_tpu.utils.config import (
        tiny_flow_config, tiny_hift_config, PipelineConfig)
    from moss_speech_decoder_cosy_tpu.models.flow import (
        CausalMaskedDiffWithXvec)
    from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
    from moss_speech_decoder_cosy_tpu.pipeline import AudioDecoder
    from moss_speech_decoder_cosy_tpu.serving.session_manager import (
        MultiStreamManager)

    cfg, hcfg = tiny_flow_config(), tiny_hift_config()
    flow, hift = CausalMaskedDiffWithXvec(cfg), HiFTGenerator(hcfg)
    rng = np.random.RandomState(0)
    tokens = rng.randint(0, cfg.vocab_size, (1, 20)).astype(np.int32)
    valid = np.ones((1, 20), bool)
    fp = flow.init(jax.random.PRNGKey(0), jnp.asarray(tokens),
                   jnp.asarray(valid),
                   jnp.zeros((1, 0, cfg.output_size)),
                   jnp.zeros((1, cfg.spk_embed_dim)))
    hp = hift.init(jax.random.PRNGKey(1),
                   jnp.zeros((1, 8, hcfg.in_channels)))
    dec = AudioDecoder(cfg, hcfg, fp, hp,
                       PipelineConfig(block_size=3, mel_cache_len=2,
                                      max_token_len=9))
    mgr = MultiStreamManager(dec)
    a = mgr.open("a", block_size=3)
    b = mgr.open("b", block_size=4, max_token_len=12)   # different knobs
    assert a.session.hop == 3 and b.session.hop == 4
    assert set(mgr.active) == {"a", "b"}

    got = mgr.push("a", tokens[0, :12]) + mgr.push("a", tokens[0, 12:]) \
        + mgr.finish("a")
    ref_sess = dec.new_session(block_size=3)
    want = list(ref_sess.push(tokens[0])) + list(ref_sess.finish())
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-6)

    assert mgr.finish("a") == []                  # idempotent
    assert mgr.stats()["a"]["finished"]
    assert mgr.active == ["b"]
    mgr.finish("b")
    mgr.close("a")
    mgr.close("b")
    assert mgr.stats() == {}
    import pytest
    with pytest.raises(KeyError):
        mgr.push("a", tokens[0, :3])


def test_batcher_sse_concurrent_requests():
    """BatcherSSEServer: two concurrent /generate_stream requests share
    the ContinuousBatcher slot pool; each stream must equal per-request
    Qwen2SpeechLM.generate for its seed."""
    import jax
    import jax.numpy as jnp
    from moss_speech_decoder_cosy_tpu.models.llm.speech_lm import (
        Qwen2SpeechLM, tiny_speech_lm_config)
    from moss_speech_decoder_cosy_tpu.serving.lm_server import (
        ContinuousBatcher)
    from moss_speech_decoder_cosy_tpu.serving.token_server import (
        BatcherSSEServer, consume_sse)
    from aiohttp.test_utils import TestServer

    cfg = tiny_speech_lm_config()
    m = Qwen2SpeechLM(cfg)
    rng = np.random.RandomState(5)
    texts = [rng.randint(0, 100, (1, n)).tolist()[0] for n in (4, 5)]
    seeds = [7, 8]
    ps = jnp.zeros((1, 0), jnp.int32)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.asarray([texts[0]]), ps, jax.random.PRNGKey(1),
                    max_len=8)
    want = []
    for text, seed in zip(texts, seeds):
        toks, n = m.apply(params, jnp.asarray([text]), ps,
                          jax.random.PRNGKey(seed), max_len=32)
        want.append([int(t) for t in np.asarray(toks)[: int(n)]])

    async def run():
        bat = ContinuousBatcher(m, params, slots=2, step_chunk=4,
                                text_buckets=(8,), speech_buckets=(0,))
        srv = BatcherSSEServer(bat)
        server = TestServer(srv.app)
        await server.start_server()
        url = str(server.make_url("/generate_stream"))

        async def client(text, seed):
            out = []
            async for t in consume_sse(url, {"text_ids": text,
                                             "seed": seed,
                                             "max_len": 32}):
                out.append(t)
            return out

        got = await asyncio.gather(client(texts[0], seeds[0]),
                                   client(texts[1], seeds[1]))
        await server.close()
        return got

    got = asyncio.run(run())
    assert got[0] == want[0]
    assert got[1] == want[1]


def test_ogg_eos_granule_trims_padding():
    """RFC 7845 §4.5: when flush() pads the tail frame, the EOS page's
    granule must cover only the real samples so decoders trim the
    padding (advisor round 2)."""
    pytest.importorskip("ctypes")
    from moss_speech_decoder_cosy_tpu.serving.ogg import (OggOpusWriter,
                                                          OggPageReader)
    try:
        w = OggOpusWriter(sample_rate=24000, channels=1, frame_ms=20)
    except OSError:
        pytest.skip("libopus not available")
    frame = w.enc.frame
    n_real = frame + frame // 3            # one full frame + a partial tail
    pcm = [0.01] * n_real
    data = w.encode(pcm) + w.flush()

    # walk pages; record granule of the EOS page
    r = OggPageReader()
    list(r.packets_in(data))
    # parse page headers manually for the EOS flag + granule
    import struct
    eos_granule = None
    i = 0
    while i < len(data):
        assert data[i:i + 4] == b"OggS"
        htype = data[i + 5]
        granule = struct.unpack("<q", data[i + 6:i + 14])[0]
        nseg = data[i + 26]
        segs = data[i + 27:i + 27 + nseg]
        body = sum(segs)
        if htype & 0x04:
            eos_granule = granule
        i += 27 + nseg + body
    assert eos_granule is not None
    expect = w.pre_skip + n_real * 48000 // 24000
    assert eos_granule == expect, (eos_granule, expect)


_BOOT_SCRIPT = r"""
import jax
# sitecustomize (PYTHONPATH=.axon_site) bakes JAX_PLATFORMS=axon into the
# config defaults of every python process — override AFTER import (same
# dance as conftest.py) or this subprocess tries to init the TPU relay.
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from moss_speech_decoder_cosy_tpu.models.flow import CausalMaskedDiffWithXvec
from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
from moss_speech_decoder_cosy_tpu.pipeline import AudioDecoder
from moss_speech_decoder_cosy_tpu.utils.config import (
    tiny_flow_config, tiny_hift_config, PipelineConfig)
from moss_speech_decoder_cosy_tpu.serving.boot import boot_warmup

cfg, hcfg = tiny_flow_config(), tiny_hift_config()
import dataclasses
hcfg = dataclasses.replace(hcfg, in_channels=cfg.output_size)
flow = CausalMaskedDiffWithXvec(cfg)
hift = HiFTGenerator(hcfg)
fp = flow.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
               jnp.ones((1, 8), bool), jnp.zeros((1, 0, cfg.output_size)),
               jnp.zeros((1, cfg.spk_embed_dim)))
hp = hift.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, hcfg.in_channels)))
dec = AudioDecoder(cfg, hcfg, fp, hp,
                   PipelineConfig(block_size=3, mel_cache_len=2,
                                  max_token_len=9))
boot_warmup(decoder=dec, n_tokens=18, verbose=False)
n_flow = dec._flow_fn._cache_size()
n_hift = dec._hift_fn._cache_size()
assert n_flow >= 1 and n_hift >= 1, (n_flow, n_hift)

# a real first request compiles NOTHING new
sess = dec.new_session()
rng = np.random.RandomState(1)
toks = rng.randint(0, cfg.vocab_size, (18,))
out = list(sess.push(toks)) + list(sess.finish())
assert sum(c.shape[-1] for c in out) > 0
assert dec._flow_fn._cache_size() == n_flow, \
    (dec._flow_fn._cache_size(), n_flow)
assert dec._hift_fn._cache_size() == n_hift, \
    (dec._hift_fn._cache_size(), n_hift)
print("BOOT_OK", n_flow, n_hift)
"""


@pytest.mark.slow
def test_boot_warmup_compiles_hop_programs(tmp_path):
    """serving/boot.boot_warmup: after boot, the session hop programs are
    compiled — a first request triggers NO new compilation (the cold-start
    owner the round-2 verdict asked for).

    Runs in a subprocess: cold-process boot is exactly the scenario the
    feature owns, and jit-cache counting is only meaningful with pristine
    process-global jax config (in-suite the count was order-dependent)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               # share the suite's persistent compile cache: boot loads
               # AOT results instead of compiling (still populates the
               # jit caches the assertions count), so warm runs are fast
               MOSS_TPU_CACHE=os.path.join(repo, ".jax_cache_cpu"),
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    r = subprocess.run([sys.executable, "-c", _BOOT_SCRIPT], env=env,
                       cwd=repo, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stdout + "\n" + r.stderr
    assert "BOOT_OK" in r.stdout, r.stdout
