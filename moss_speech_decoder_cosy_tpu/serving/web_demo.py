"""Browser voice demo — the reference web_demo.py / gradio VC demos rebuilt
on aiohttp (gradio-free).

Serves a single page that records or uploads audio, streams it to the
``/api/chat`` websocket (serving/ws_server.py protocol) and plays the
returned 24 kHz audio.  Wire a voice-conversion handler with
``make_vc_handler(codec, prompt)`` or run the echo default.
"""

from __future__ import annotations

import numpy as np

try:
    from aiohttp import web
except ImportError:                                     # pragma: no cover
    web = None

from .ws_server import AudioWsServer
from .protocol import SAMPLE_RATE

_PAGE = """<!DOCTYPE html>
<html><head><title>moss-speech-decoder-cosy_tpu demo</title>
<style>body{font-family:sans-serif;max-width:640px;margin:2em auto}
button{padding:.6em 1.2em;margin-right:1em}</style></head>
<body>
<h2>moss-speech-decoder-cosy_tpu — streaming voice demo</h2>
<p>Upload a wav (16-bit PCM); it streams over the websocket in 80 ms frames
and the processed audio plays back as chunks arrive.</p>
<input type="file" id="file" accept=".wav"/>
<button id="send">Stream</button>
<span id="status"></span>
<script>
const SR = %(sr)d, FRAME = %(frame)d;
function pcm16(f32){const o=new Int16Array(f32.length);
  for(let i=0;i<f32.length;i++){o[i]=Math.max(-1,Math.min(1,f32[i]))*32767}
  return o}
document.getElementById('send').onclick = async () => {
  const f = document.getElementById('file').files[0];
  if(!f){alert('pick a wav');return}
  const buf = await f.arrayBuffer();
  const ctx = new AudioContext({sampleRate: SR});
  const audio = await ctx.decodeAudioData(buf);
  const x = audio.getChannelData(0);
  const ws = new WebSocket(`ws://${location.host}/api/chat`);
  ws.binaryType = 'arraybuffer';
  let t = ctx.currentTime;
  ws.onmessage = (ev) => {
    const d = new Uint8Array(ev.data);
    if(d[0] === 0){ // handshake -> start sending
      for(let i=0;i<x.length;i+=FRAME){
        const seg = pcm16(x.subarray(i, i+FRAME));
        const msg = new Uint8Array(1+seg.byteLength);
        msg[0]=1; msg.set(new Uint8Array(seg.buffer),1);
        ws.send(msg);
      }
      document.getElementById('status').textContent='streaming...';
    } else if(d[0] === 1){ // audio chunk
      const i16 = new Int16Array(ev.data.slice(1));
      const f32 = Float32Array.from(i16, v=>v/32768);
      const b = ctx.createBuffer(1, f32.length, SR);
      b.copyToChannel(f32, 0);
      const src = ctx.createBufferSource();
      src.buffer = b; src.connect(ctx.destination);
      t = Math.max(t, ctx.currentTime);
      src.start(t); t += f32.length/SR;
    } else if(d[0] === 2){
      document.getElementById('status').textContent =
        new TextDecoder().decode(d.subarray(1));
    }
  };
};
</script></body></html>
"""


def make_vc_handler(codec, prompt):
    """Voice-conversion frame handler: buffers 16 kHz-resampled input,
    tokenizes incrementally, decodes with the prompt speaker."""
    from ..eval.audio_io import resample

    enc_session = codec.new_encode_session()
    dec_session = codec.decoder.new_session(
        prompt.token, prompt.feat, prompt.embedding)

    def handler(frame: np.ndarray) -> np.ndarray:
        wav16 = resample(frame, SAMPLE_RATE, 16000)
        out = []
        for tok in enc_session.push(wav16):
            for wav in dec_session.push(tok.reshape(-1)):
                out.append(wav[0])
        if out:
            return np.concatenate(out)
        return np.zeros(0, np.float32)

    return handler


class WebDemo:
    def __init__(self, handler=None, host="0.0.0.0", port=8888):
        assert web is not None
        self.ws = AudioWsServer(handler=handler, host=host, port=port,
                                log=False)
        self.ws.app.add_routes([web.get("/", self.index)])
        self.host, self.port = host, port

    async def index(self, request):
        page = _PAGE % {"sr": SAMPLE_RATE, "frame": 1920}
        return web.Response(text=page, content_type="text/html")

    def run(self):                                      # pragma: no cover
        web.run_app(self.ws.app, host=self.host, port=self.port)


if __name__ == "__main__":                              # pragma: no cover
    WebDemo(handler=lambda s: s).run()
