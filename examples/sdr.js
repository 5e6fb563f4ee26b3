/* sdr.js for csdr_tpu — browser client for the TPU DSP server.
 *
 * The reference project's sdr.js is an Emscripten build of libcsdr so the
 * kernels run in-page.  csdr_tpu's equivalent keeps the DSP on the TPU
 * server (examples/ws_bridge.py) and gives the browser the same working
 * surface, written fresh in plain JS:
 *
 *   - sdrjs.Pipe("ws://host:8765", "fir_decimate_cc", [10, 0.05])
 *       .onSamples(f32 => ...)  .send(f32)   — run any of the 117 CLI
 *       kernels remotely; samples stream as binary WebSocket frames.
 *   - sdrjs.NmuxSource("ws://host:8765", "127.0.0.1", 4952)
 *       — subscribe to an nmux fan-out stream (waterfall clients).
 *   - converters: ConvertI16_F, ConvertF_I16, ConvertU8_F, ConvertF_U8
 *     (same scaling as the wire formats, reference README.md:126-153).
 *   - sdrjs.ImaAdpcm: pure-JS IMA ADPCM codec (standard step/index
 *     tables) so compress_fft_adpcm_f_u8 waterfall streams decode
 *     in-browser without a server round-trip.
 *   - sdrjs.Rebuffer(size, mode): fixed-size re-chunking of streamed
 *     arrays (same REBUFFER_FIXED / REBUFFER_MAX semantics).
 */

var sdrjs = {};

sdrjs.WINDOW_BOXCAR = "BOXCAR";
sdrjs.WINDOW_BLACKMAN = "BLACKMAN";
sdrjs.WINDOW_HAMMING = "HAMMING";

/* ---- format converters (scale to +-1.0, like the CLI wire formats) ---- */

sdrjs.ConvertI16_F = function (i16) {
  var out = new Float32Array(i16.length);
  for (var i = 0; i < i16.length; i++) out[i] = i16[i] / 32768;
  return out;
};

sdrjs.ConvertF_I16 = function (f32) {
  var out = new Int16Array(f32.length);
  for (var i = 0; i < f32.length; i++) {
    var v = Math.max(-1, Math.min(1, f32[i]));
    out[i] = Math.round(v * 32767);
  }
  return out;
};

sdrjs.ConvertU8_F = function (u8) {
  var out = new Float32Array(u8.length);
  for (var i = 0; i < u8.length; i++) out[i] = u8[i] / 127.5 - 1;  /* reference convert_u8_f scale */
  return out;
};

sdrjs.ConvertF_U8 = function (f32) {
  var out = new Uint8Array(f32.length);
  for (var i = 0; i < f32.length; i++) {
    var v = Math.max(-1, Math.min(1, f32[i]));
    out[i] = Math.round((v + 1) * 127.5);
  }
  return out;
};

/* ---- IMA ADPCM (standard tables; decodes compress_fft_adpcm output) -- */

sdrjs._IMA_STEPS = [
  7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
  45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
  209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
  796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
  2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
  7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
  20350, 22385, 24623, 27086, 29794, 32767];
sdrjs._IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8];

sdrjs.ImaAdpcm = function () {
  this.pred = 0;
  this.index = 0;
  this.reset = function () { this.pred = 0; this.index = 0; };
  this._decodeNibble = function (nib) {
    var step = sdrjs._IMA_STEPS[this.index];
    var diff = step >> 3;
    if (nib & 1) diff += step >> 2;
    if (nib & 2) diff += step >> 1;
    if (nib & 4) diff += step;
    if (nib & 8) diff = -diff;
    this.pred = Math.max(-32768, Math.min(32767, this.pred + diff));
    this.index = Math.max(0, Math.min(88,
      this.index + sdrjs._IMA_INDEX[nib]));
    return this.pred;
  };
  this.decode = function (u8) {
    var out = new Int16Array(u8.length * 2);
    for (var i = 0; i < u8.length; i++) {
      out[2 * i] = this._decodeNibble(u8[i] & 0x0f);
      out[2 * i + 1] = this._decodeNibble((u8[i] >> 4) & 0x0f);
    }
    return out;
  };
  this._encodeSample = function (s) {
    var step = sdrjs._IMA_STEPS[this.index];
    var diff = s - this.pred;
    var nib = 0;
    if (diff < 0) { nib = 8; diff = -diff; }
    if (diff >= step) { nib |= 4; diff -= step; }
    if (diff >= (step >> 1)) { nib |= 2; diff -= step >> 1; }
    if (diff >= (step >> 2)) { nib |= 1; }
    this._decodeNibble(nib);     // update predictor exactly like decode
    return nib;
  };
  this.encode = function (i16) {
    var out = new Uint8Array(i16.length >> 1);
    for (var i = 0; i < out.length; i++) {
      var lo = this._encodeSample(i16[2 * i]);
      var hi = this._encodeSample(i16[2 * i + 1]);
      out[i] = lo | (hi << 4);
    }
    return out;
  };
};

/* ---- Rebuffer: re-chunk streamed arrays to fixed sizes --------------- */

sdrjs.REBUFFER_FIXED = 0;
sdrjs.REBUFFER_MAX = 1;

sdrjs.Rebuffer = function (size, mode) {
  this.size = size;
  this.mode = mode;
  this._chunks = [];
  this._total = 0;
  this.push = function (arr) { this._chunks.push(arr); this._total += arr.length; };
  this.remaining = function () {
    var full = Math.floor(this._total / this.size);
    if (this.mode === sdrjs.REBUFFER_MAX && this._total % this.size) full += 1;
    return full;
  };
  this.take = function () {
    var want = this.size;
    if (this.mode === sdrjs.REBUFFER_MAX) want = Math.min(want, this._total);
    if (want === 0 || this._total < want) return null;
    var out = new Float32Array(want);
    var off = 0;
    while (off < want) {
      var head = this._chunks[0];
      var n = Math.min(head.length, want - off);
      out.set(head.subarray(0, n), off);
      if (n === head.length) this._chunks.shift();
      else this._chunks[0] = head.subarray(n);
      off += n;
    }
    this._total -= want;
    return out;
  };
};

/* ---- remote kernels over the WebSocket bridge ------------------------ */

sdrjs.Pipe = function (bridgeUrl, command, args) {
  var q = args && args.length ? "?args=" + args.join(",") : "";
  this.ws = new WebSocket(bridgeUrl.replace(/\/$/, "") +
                          "/pipe/" + command + q);
  this.ws.binaryType = "arraybuffer";
  var self = this;
  this.onSamples = function (cb) {
    self.ws.onmessage = function (ev) {
      cb(new Float32Array(ev.data));
    };
    return self;
  };
  this.onBytes = function (cb) {
    self.ws.onmessage = function (ev) { cb(new Uint8Array(ev.data)); };
    return self;
  };
  this.send = function (typedArray) { self.ws.send(typedArray.buffer); };
  this.close = function () { self.ws.close(); };
};

sdrjs.NmuxSource = function (bridgeUrl, host, port) {
  this.ws = new WebSocket(bridgeUrl.replace(/\/$/, "") +
                          "/nmux/" + host + "/" + port);
  this.ws.binaryType = "arraybuffer";
  var self = this;
  this.onSamples = function (cb) {
    self.ws.onmessage = function (ev) { cb(new Float32Array(ev.data)); };
    return self;
  };
  this.close = function () { self.ws.close(); };
};

if (typeof module !== "undefined") module.exports = sdrjs;
