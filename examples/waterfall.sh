#!/bin/bash
# OpenWebRX-style waterfall transport chain (reference csdr usage):
# wideband IQ -> windowed FFT frames -> averaged log power -> fftshift ->
# ADPCM-compressed rows on stdout (4:1), ready for a web client.
# Usage: rtl_sdr ... - | ./waterfall.sh [fft_size] [frames_averaged]
set -e
FFT=${1:-1024}
AVG=${2:-16}
CSDR="python3 -m csdr_tpu.cli"
$CSDR convert_u8_f \
  | $CSDR fft_cc "$FFT" "$FFT" \
  | $CSDR logaveragepower_cf -70 "$FFT" "$AVG" \
  | $CSDR fft_exchange_sides_ff "$FFT" \
  | $CSDR compress_fft_adpcm_f_u8 "$FFT"
