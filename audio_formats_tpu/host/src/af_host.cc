// Native host entropy stage: the serial, branchy bit-level inner loops that
// feed the device DSP.  C ABI (consumed via ctypes, no pybind dependency).
//
// Components:
//  * MP3 Layer III Huffman big-values/count1 decode (the reference's hot
//    loop, minimp3.d:748-883) -> quantized ints + per-coefficient gains
//  * FLAC subframe + partitioned-Rice residual decode (drflac.d:1149-1330)
//    -> dense residual/coefficient tensors
//
// Tables are injected from Python at init (canonical spec data from
// audio_formats_tpu/utils/tables) so no constant data is duplicated here.
//
// Build: g++ -O3 -shared -fPIC (see ../native.py).

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cmath>

extern "C" {

// ---------------------------------------------------------------------------
// Bit reader (MSB-first) with a 64-bit cache
// ---------------------------------------------------------------------------

struct BitReader {
  const uint8_t* buf;
  int64_t nbits;
  int64_t pos;
};

static inline uint32_t br_peek(const BitReader* br, int n) {
  // n <= 32; reads beyond the end return zero bits (callers bound reads)
  int64_t p = br->pos;
  int64_t byte = p >> 3;
  uint64_t w = 0;
  // assemble 8 bytes big-endian, tolerating EOF
  int64_t size = (br->nbits + 7) >> 3;
  for (int i = 0; i < 8; i++) {
    w = (w << 8) | (byte + i < size ? br->buf[byte + i] : 0);
  }
  return (uint32_t)((w << (p & 7)) >> (64 - n));
}

static inline uint32_t br_get(BitReader* br, int n) {
  uint32_t v = n ? br_peek(br, n) : 0;
  br->pos += n;
  return v;
}

static inline int br_unary(BitReader* br) {
  // count zeros to the first 1 bit; returns count, consumes count+1 bits
  int count = 0;
  for (;;) {
    if (br->pos >= br->nbits) return -1;
    int64_t byte = br->pos >> 3;
    int rem = 8 - (int)(br->pos & 7);
    uint8_t chunk = br->buf[byte] & ((1 << rem) - 1);
    if (chunk == 0) {
      count += rem;
      br->pos += rem;
    } else {
      int lead = rem - (32 - __builtin_clz((uint32_t)chunk) );
      count += lead;
      br->pos += lead + 1;
      return count;
    }
  }
}

// ---------------------------------------------------------------------------
// MP3 Huffman
// ---------------------------------------------------------------------------

// Flat per-table LUTs sized 1<<maxlen; entry packs (len<<16 | x<<8 | y).
static uint32_t* g_mp3_lut[34] = {nullptr};
static int g_mp3_lut_bits[34] = {0};
static int g_mp3_linbits[32] = {0};

// codes: int32 quads (code, len, x, y) * n
int af_mp3_set_table(int table_id, const int32_t* codes, int n, int linbits) {
  if (table_id < 0 || table_id >= 34) return -1;
  int maxlen = 0;
  for (int i = 0; i < n; i++) maxlen = codes[i * 4 + 1] > maxlen ? codes[i * 4 + 1] : maxlen;
  if (maxlen == 0) {  // empty table (table 0)
    g_mp3_lut[table_id] = nullptr;
    g_mp3_lut_bits[table_id] = 0;
    if (table_id < 32) g_mp3_linbits[table_id] = linbits;
    return 0;
  }
  size_t size = (size_t)1 << maxlen;
  uint32_t* lut = (uint32_t*)malloc(size * sizeof(uint32_t));
  memset(lut, 0xFF, size * sizeof(uint32_t));
  for (int i = 0; i < n; i++) {
    uint32_t code = (uint32_t)codes[i * 4 + 0];
    int len = codes[i * 4 + 1];
    uint32_t x = (uint32_t)codes[i * 4 + 2];
    uint32_t y = (uint32_t)codes[i * 4 + 3];
    uint32_t base = code << (maxlen - len);
    uint32_t fill = 1u << (maxlen - len);
    uint32_t entry = ((uint32_t)len << 16) | (x << 8) | y;
    for (uint32_t j = 0; j < fill; j++) lut[base + j] = entry;
  }
  g_mp3_lut[table_id] = lut;
  g_mp3_lut_bits[table_id] = maxlen;
  if (table_id < 32) g_mp3_linbits[table_id] = linbits;
  return 0;
}

// Decode one granule-channel.  Layout of scalar args mirrors the Python
// implementation (models/mp3.py _huffman).  Returns the final bit position
// (== limit_bits), or -1 on invalid codes.
int64_t af_mp3_huffman(
    const uint8_t* maindata, int64_t nbytes, int64_t start_bits,
    int64_t limit_bits,
    const int32_t* table_select,   // [3]
    const int32_t* region_count,   // [3]
    const uint8_t* sfbtab,         // [40+] width entries, 0-terminated
    const float* scf,              // [40] per-sfb gains
    int32_t big_values, int32_t count1_table,
    int32_t* q_out, float* gain_out /* [576] each */) {
  BitReader br = {maindata, nbytes * 8, start_bits};
  for (int i = 0; i < 576; i++) { q_out[i] = 0; gain_out[i] = 0.0f; }

  int pos = 0, sfb_i = 0, scf_i = 0;
  float one = 0.0f;
  int big = big_values;

  for (int region = 0; region < 3 && big > 0; region++) {
    int tab = table_select[region];
    uint32_t* lut = g_mp3_lut[tab];
    int lut_bits = g_mp3_lut_bits[tab];
    int linbits = g_mp3_linbits[tab];
    int sfb_cnt = region_count[region];
    for (;;) {
      int np_pairs = sfbtab[sfb_i] / 2;
      sfb_i++;
      int pairs = big < np_pairs ? big : np_pairs;
      one = scf[scf_i];
      scf_i++;
      for (int p2 = 0; p2 < pairs; p2++) {
        int x = 0, y = 0;
        if (lut) {
          uint32_t peek = br_peek(&br, lut_bits <= 24 ? lut_bits : lut_bits);
          uint32_t e = lut[peek];
          if (e == 0xFFFFFFFFu) return -1;
          br.pos += (int)(e >> 16);
          x = (int)((e >> 8) & 0xFF);
          y = (int)(e & 0xFF);
        }
        int vals[2] = {x, y};
        for (int j = 0; j < 2; j++) {
          int v = vals[j];
          if (v == 15 && linbits) v += (int)br_get(&br, linbits);
          if (v && br_get(&br, 1)) v = -v;
          if (pos < 576) { q_out[pos] = v; gain_out[pos] = one; }
          pos++;
        }
      }
      big -= np_pairs;
      sfb_cnt -= 1;
      if (big <= 0 || sfb_cnt < 0) break;
    }
  }

  // count1 region
  {
    uint32_t* lut = g_mp3_lut[32 + count1_table];
    int lut_bits = g_mp3_lut_bits[32 + count1_table];
    int npairs = 1 - big;
    while (pos <= 572) {
      uint32_t peek = br_peek(&br, lut_bits);
      uint32_t e = lut[peek];
      if (e == 0xFFFFFFFFu) return -1;
      br.pos += (int)(e >> 16);
      if (br.pos > limit_bits) break;
      uint32_t v = (e >> 8) & 0xFF;  // count1 mask lives in the x slot
      int stop = 0;
      for (int s = 0; s < 4; s++) {
        if ((s & 1) == 0) {
          if (--npairs == 0) {
            int np_pairs = sfbtab[sfb_i] / 2;
            sfb_i++;
            if (np_pairs == 0) { stop = 1; break; }
            npairs = np_pairs;
            one = scf[scf_i];
            scf_i++;
          }
        }
        if ((v >> (3 - s)) & 1) {
          int val = br_get(&br, 1) ? -1 : 1;
          q_out[pos + s] = val;
          gain_out[pos + s] = one;
        } else {
          gain_out[pos + s] = one;
        }
      }
      if (stop) break;
      pos += 4;
    }
  }
  return limit_bits;
}

// ---------------------------------------------------------------------------
// FLAC frame parse (subframes + Rice residuals)
// ---------------------------------------------------------------------------

// Fixed predictor coefficients
static const int32_t kFixedCoef[5][4] = {
    {0, 0, 0, 0}, {1, 0, 0, 0}, {2, -1, 0, 0}, {3, -3, 1, 0}, {4, -6, 4, -1}};

static inline int32_t br_signed(BitReader* br, int n) {
  if (n == 0) return 0;
  uint32_t v = br_get(br, n);
  if (v >= (1u << (n - 1))) return (int32_t)v - (int32_t)(1u << n);
  return (int32_t)v;
}

// Parses one FLAC frame starting at bit position `start_bits` in `data`.
// Outputs (caller-allocated):
//   residual  [max_ch * max_block] int32 (row-major per channel)
//   coeffs    [max_ch * 32] int32
//   order, shift, wasted, bps  [max_ch] int32
//   meta[0]=blocksize meta[1]=chan_assignment meta[2]=nch meta[3]=end_bitpos lo
//   meta[4]=end_bitpos hi
// Returns 0 on success, negative error code otherwise.
int af_flac_parse_frame(
    const uint8_t* data, int64_t nbytes, int64_t start_bits,
    int32_t streaminfo_bps, int32_t expect_channels,
    int32_t max_block,
    int32_t* residual, int32_t* coeffs, int32_t* order_out,
    int32_t* shift_out, int32_t* wasted_out, int32_t* bps_out,
    int64_t* meta) {
  BitReader br = {data, nbytes * 8, start_bits};
  if (br_get(&br, 14) != 0x3FFE) return -1;
  br_get(&br, 1);
  br_get(&br, 1);
  int bs_code = (int)br_get(&br, 4);
  int sr_code = (int)br_get(&br, 4);
  int chan_assignment = (int)br_get(&br, 4);
  int bps_code = (int)br_get(&br, 3);
  br_get(&br, 1);
  // UTF-8 coded number
  {
    uint32_t first = br_get(&br, 8);
    if (first >= 0x80) {
      int n = 0;
      uint32_t mask = 0x40;
      while (first & mask) { n++; mask >>= 1; }
      if (n == 0 || n > 6) return -2;
      for (int i = 0; i < n; i++) {
        uint32_t c = br_get(&br, 8);
        if ((c & 0xC0) != 0x80) return -2;
      }
    }
  }
  int blocksize;
  if (bs_code == 1) blocksize = 192;
  else if (bs_code >= 2 && bs_code <= 5) blocksize = 576 << (bs_code - 2);
  else if (bs_code == 6) blocksize = (int)br_get(&br, 8) + 1;
  else if (bs_code == 7) blocksize = (int)br_get(&br, 16) + 1;
  else if (bs_code >= 8) blocksize = 256 << (bs_code - 8);
  else return -3;
  if (blocksize > max_block) return -3;
  if (sr_code == 12) br_get(&br, 8);
  else if (sr_code == 13 || sr_code == 14) br_get(&br, 16);
  else if (sr_code == 15) return -4;
  static const int bps_table[8] = {0, 8, 12, -1, 16, 20, 24, -1};
  int bps = bps_table[bps_code];
  if (bps == -1) return -5;
  if (bps == 0) bps = streaminfo_bps;
  br_get(&br, 8);  // CRC-8 (stored, not validated — as drflac)

  int nch = chan_assignment <= 7 ? chan_assignment + 1 : 2;
  if (chan_assignment > 10) return -6;
  if (nch != expect_channels) return -6;

  for (int ci = 0; ci < nch; ci++) {
    int sub_bps = bps;
    if ((chan_assignment == 8 || chan_assignment == 10) && ci == 1) sub_bps++;
    else if (chan_assignment == 9 && ci == 0) sub_bps++;

    uint32_t header = br_get(&br, 8);
    if (header & 0x80) return -7;
    int t = (header & 0x7E) >> 1;
    int wasted = 0;
    if (header & 1) {
      int u = br_unary(&br);
      if (u < 0) return -8;
      wasted = u + 1;
    }
    sub_bps -= wasted;
    int32_t* res = residual + (int64_t)ci * max_block;
    int32_t* cf = coeffs + ci * 32;
    for (int j = 0; j < 32; j++) cf[j] = 0;
    int order = 0, shift = 0;

    if (t == 0) {  // CONSTANT
      int32_t v = br_signed(&br, sub_bps);
      for (int i = 0; i < blocksize; i++) res[i] = v;
      order = blocksize;
    } else if (t == 1) {  // VERBATIM
      for (int i = 0; i < blocksize; i++) res[i] = br_signed(&br, sub_bps);
      order = blocksize;
    } else if (t & 0x20) {  // LPC
      order = (t & 0x1F) + 1;
      for (int i = 0; i < order; i++) res[i] = br_signed(&br, sub_bps);
      int precision = (int)br_get(&br, 4);
      if (precision == 15) return -9;
      precision += 1;
      shift = br_signed(&br, 5);
      if (shift < 0) shift = 0;
      for (int j = 0; j < order; j++) cf[j] = br_signed(&br, precision);
      // residual
      goto residual_decode;
    } else if (t & 0x08) {  // FIXED
      order = t & 0x07;
      if (order > 4) return -10;
      for (int i = 0; i < order; i++) res[i] = br_signed(&br, sub_bps);
      for (int j = 0; j < 4; j++) cf[j] = kFixedCoef[order][j];
      goto residual_decode;
    } else {
      return -11;
    }
    goto done_subframe;

  residual_decode: {
      int method = (int)br_get(&br, 2);
      if (method > 1) return -12;
      int param_bits = method == 0 ? 4 : 5;
      int escape = method == 0 ? 15 : 31;
      int partition_order = (int)br_get(&br, 4);
      int idx = order;
      int n_partitions = 1 << partition_order;
      int base = blocksize >> partition_order;
      for (int p = 0; p < n_partitions; p++) {
        int count = p == 0 ? base - order : base;
        if (count < 0 || idx + count > blocksize) return -13;
        int param = (int)br_get(&br, param_bits);
        if (param == escape) {
          int nbits = (int)br_get(&br, 5);
          if (nbits == 0) {
            for (int i = 0; i < count; i++) res[idx + i] = 0;
          } else {
            for (int i = 0; i < count; i++) res[idx + i] = br_signed(&br, nbits);
          }
        } else {
          for (int i = 0; i < count; i++) {
            int qv = br_unary(&br);
            if (qv < 0) return -14;
            uint32_t u = ((uint32_t)qv << param) | br_get(&br, param);
            res[idx + i] = (int32_t)(u >> 1) ^ -(int32_t)(u & 1);
          }
        }
        idx += count;
      }
    }

  done_subframe:
    order_out[ci] = order;
    shift_out[ci] = shift;
    wasted_out[ci] = wasted;
    bps_out[ci] = sub_bps;
  }

  // byte align + CRC16
  br.pos = (br.pos + 7) & ~7LL;
  br_get(&br, 16);
  if (br.pos > br.nbits) return -15;

  meta[0] = blocksize;
  meta[1] = chan_assignment;
  meta[2] = nch;
  meta[3] = br.pos;
  return 0;
}

// ---------------------------------------------------------------------------
// MP3 Layer III: full side-info + scalefactor + Huffman frame parse
// ---------------------------------------------------------------------------

struct Mp3Bits {
  const uint8_t* buf;
  int64_t pos;
  int64_t limit;
};

static inline uint32_t mp3_get(Mp3Bits* bs, int n) {
  int64_t p = bs->pos;
  bs->pos = p + n;
  if (bs->pos > bs->limit || n == 0) return 0;
  int64_t first = p >> 3;
  int64_t last = (p + n - 1) >> 3;
  uint64_t w = 0;
  for (int64_t i = first; i <= last; i++) w = (w << 8) | bs->buf[i];
  return (uint32_t)((w >> ((last + 1) * 8 - p - n)) & ((n == 32) ? 0xFFFFFFFFu : ((1u << n) - 1)));
}

// Tables injected from Python at init.
static uint8_t g_scf_long[8 * 23];
static uint8_t g_scf_short[8 * 40];
static uint8_t g_scf_mixed[8 * 40];
static uint8_t g_scf_partitions[3 * 28];
static uint8_t g_scfc_decode[16];
static uint8_t g_scf_mod[24];
static uint8_t g_preamp[10];

int af_mp3_set_l3_tables(const uint8_t* scf_long, const uint8_t* scf_short,
                         const uint8_t* scf_mixed, const uint8_t* parts,
                         const uint8_t* scfc, const uint8_t* mod,
                         const uint8_t* preamp) {
  memcpy(g_scf_long, scf_long, sizeof(g_scf_long));
  memcpy(g_scf_short, scf_short, sizeof(g_scf_short));
  memcpy(g_scf_mixed, scf_mixed, sizeof(g_scf_mixed));
  memcpy(g_scf_partitions, parts, sizeof(g_scf_partitions));
  memcpy(g_scfc_decode, scfc, sizeof(g_scfc_decode));
  memcpy(g_scf_mod, mod, sizeof(g_scf_mod));
  memcpy(g_preamp, preamp, sizeof(g_preamp));
  return 0;
}

struct GrInfo {
  const uint8_t* sfbtab;
  int part_23_length, big_values, scalefac_compress;
  int global_gain, block_type, mixed_block_flag, n_long_sfb, n_short_sfb;
  int table_select[3], region_count[3], subblock_gain[3];
  int preflag, scalefac_scale, count1_table, scfsi;
};

// L3_read_side_info (minimp3.d:487-640).  Returns main_data_begin or -1.
static int mp3_side_info(Mp3Bits* bs, GrInfo* gr, const uint8_t* h) {
  int sr_idx = ((h[2] >> 2) & 3) + (((h[1] >> 3) & 1) + ((h[1] >> 4) & 1)) * 3;
  sr_idx -= (sr_idx != 0);
  int mpeg1 = h[1] & 0x8;
  int mono = (h[3] & 0xC0) == 0xC0;
  int gr_count = mono ? 1 : 2;
  unsigned scfsi = 0;
  int main_data_begin;
  if (mpeg1) {
    gr_count *= 2;
    main_data_begin = (int)mp3_get(bs, 9);
    scfsi = mp3_get(bs, 7 + gr_count);
  } else {
    main_data_begin = (int)(mp3_get(bs, 8 + gr_count) >> gr_count);
  }
  int part_23_sum = 0;
  for (int g = 0; g < gr_count; g++, gr++) {
    if (mono) scfsi <<= 4;
    gr->part_23_length = (int)mp3_get(bs, 12);
    part_23_sum += gr->part_23_length;
    gr->big_values = (int)mp3_get(bs, 9);
    if (gr->big_values > 288) return -1;
    gr->global_gain = (int)mp3_get(bs, 8);
    gr->scalefac_compress = (int)mp3_get(bs, mpeg1 ? 4 : 9);
    gr->sfbtab = g_scf_long + sr_idx * 23;
    gr->n_long_sfb = 22;
    gr->n_short_sfb = 0;
    gr->region_count[0] = gr->region_count[1] = gr->region_count[2] = 0;
    gr->subblock_gain[0] = gr->subblock_gain[1] = gr->subblock_gain[2] = 0;
    gr->mixed_block_flag = 0;
    unsigned tables;
    if (mp3_get(bs, 1)) {
      gr->block_type = (int)mp3_get(bs, 2);
      if (!gr->block_type) return -1;
      gr->mixed_block_flag = (int)mp3_get(bs, 1);
      gr->region_count[0] = 7;
      gr->region_count[1] = 255;
      if (gr->block_type == 2) {
        scfsi &= 0x0F0F;
        if (!gr->mixed_block_flag) {
          gr->region_count[0] = 8;
          gr->sfbtab = g_scf_short + sr_idx * 40;
          gr->n_long_sfb = 0;
          gr->n_short_sfb = 39;
        } else {
          gr->sfbtab = g_scf_mixed + sr_idx * 40;
          gr->n_long_sfb = mpeg1 ? 8 : 6;
          gr->n_short_sfb = 30;
        }
      }
      tables = mp3_get(bs, 10) << 5;
      gr->subblock_gain[0] = (int)mp3_get(bs, 3);
      gr->subblock_gain[1] = (int)mp3_get(bs, 3);
      gr->subblock_gain[2] = (int)mp3_get(bs, 3);
    } else {
      gr->block_type = 0;
      tables = mp3_get(bs, 15);
      gr->region_count[0] = (int)mp3_get(bs, 4);
      gr->region_count[1] = (int)mp3_get(bs, 3);
      gr->region_count[2] = 255;
    }
    gr->table_select[0] = (int)(tables >> 10);
    gr->table_select[1] = (int)((tables >> 5) & 31);
    gr->table_select[2] = (int)(tables & 31);
    gr->preflag = mpeg1 ? (int)mp3_get(bs, 1) : (gr->scalefac_compress >= 500);
    gr->scalefac_scale = (int)mp3_get(bs, 1);
    gr->count1_table = (int)mp3_get(bs, 1);
    gr->scfsi = (int)((scfsi >> 12) & 15);
    scfsi <<= 4;
  }
  if (part_23_sum + bs->pos > bs->limit + (int64_t)main_data_begin * 8)
    return -1;
  return main_data_begin;
}

// L3_decode_scalefactors (minimp3.d:648-720) over the maindata reader.
static void mp3_scalefactors(const uint8_t* h, int32_t* ist_pos,
                             BitReader* br, const GrInfo* gr, int ch,
                             float* scf /*[40]*/) {
  int mpeg1 = h[1] & 0x8;
  int part_idx = (gr->n_short_sfb ? 1 : 0) + (gr->n_long_sfb ? 0 : 1);
  const uint8_t* scf_partition = g_scf_partitions + part_idx * 28;
  int scf_size[4] = {0, 0, 0, 0};
  int32_t iscf[43];
  memset(iscf, 0, sizeof(iscf));
  int scf_shift = gr->scalefac_scale + 1;
  long scfsi = gr->scfsi;
  int k = 0;
  if (mpeg1) {
    int part = g_scfc_decode[gr->scalefac_compress];
    scf_size[0] = scf_size[1] = part >> 2;
    scf_size[2] = scf_size[3] = part & 3;
  } else {
    int ist = ((h[3] & 0x10) && ch) ? 1 : 0;
    long sfc = gr->scalefac_compress >> ist;
    k = ist * 3 * 4;
    while (sfc >= 0) {
      long modprod = 1;
      for (int i = 3; i >= 0; i--) {
        scf_size[i] = (int)((sfc / modprod) % g_scf_mod[k + i]);
        modprod *= g_scf_mod[k + i];
      }
      sfc -= modprod;
      k += 4;
    }
    scfsi = -16;
  }
  // read scalefactors
  {
    const uint8_t* scf_count = scf_partition + k;
    int n = 0;
    for (int i = 0; i < 4 && scf_count[i]; i++) {
      int cnt = scf_count[i];
      if (scfsi & 8) {
        for (int j = 0; j < cnt; j++) iscf[n + j] = ist_pos[n + j];
      } else {
        int bits = scf_size[i];
        if (!bits) {
          for (int j = 0; j < cnt; j++) { iscf[n + j] = 0; ist_pos[n + j] = 0; }
        } else {
          int max_scf = (scfsi < 0) ? (1 << bits) - 1 : -1;
          for (int j = 0; j < cnt; j++) {
            int s = (int)br_get(br, bits);
            ist_pos[n + j] = (s == max_scf) ? 255 : s;
            iscf[n + j] = s;
          }
        }
      }
      n += cnt;
      scfsi *= 2;
    }
    iscf[n] = iscf[n + 1] = iscf[n + 2] = 0;
  }
  if (gr->n_short_sfb) {
    int sh = 3 - scf_shift;
    for (int i = 0; i < gr->n_short_sfb; i += 3) {
      iscf[gr->n_long_sfb + i + 0] += gr->subblock_gain[0] << sh;
      iscf[gr->n_long_sfb + i + 1] += gr->subblock_gain[1] << sh;
      iscf[gr->n_long_sfb + i + 2] += gr->subblock_gain[2] << sh;
    }
  } else if (gr->preflag) {
    for (int i = 0; i < 10; i++) iscf[11 + i] += g_preamp[i];
  }
  int ms_stereo = (h[3] & 0xE0) == 0x60;
  int gain_exp = gr->global_gain - 4 - 210 - (ms_stereo ? 2 : 0);
  int nb = gr->n_long_sfb + gr->n_short_sfb;
  for (int i = 0; i < 40; i++) scf[i] = 0.0f;
  for (int i = 0; i < nb; i++) {
    long e = (long)gain_exp - ((long)iscf[i] << scf_shift);
    scf[i] = (float)exp2((double)e / 4.0);
  }
}

// Full-frame Layer III main-data parse: scalefactors + Huffman for every
// granule-channel.  maindata layout mirrors the Python path.
//   q_out    [ngr*nch*576] int32
//   gain_out [ngr*nch*576] float
//   meta_in: [0]=ngr [1]=nch; header: 4 bytes
//   gr_fields: int32[ngr*nch*24] packed GrInfo fields from Python? No —
//   side info is parsed here too, from the frame bytes.
// Returns 0 ok, -1 bad side info (decoder resets), -2 reservoir underflow
// handled by caller (this function is only called when restore succeeded).

// Lean per-frame entry: Python parses side info (it owns the bit-reservoir
// bookkeeping) and passes per-granule parameters; this decodes scalefactors
// + Huffman for every granule-channel in one call.
// gr_params per granule-channel, int32[20]:
//  [0]=part_23_length [1]=big_values [2]=scalefac_compress [3]=global_gain
//  [4]=block_type [5]=mixed [6]=n_long_sfb [7]=n_short_sfb
//  [8..10]=table_select [11..13]=region_count [14..16]=subblock_gain
//  [17]=preflag [18]=scalefac_scale [19]=count1_table ; scfsi in [20]? ->
//  packed as [21] ints with [20]=scfsi.
int af_mp3_granules_scf_huff(
    const uint8_t* hdr4, const uint8_t* maindata, int64_t maindata_len,
    const int32_t* gr_params /* [ngr*nch*21] */,
    const uint8_t* sfbtabs /* [ngr*nch*40] */,
    int32_t ngr, int32_t nch,
    int32_t* ist_pos /* [2*40] persistent */,
    int32_t* q_out, float* gain_out /* [ngr*nch*576] */,
    int32_t* ist_snapshot /* [ngr*40] */) {
  BitReader br = {maindata, maindata_len * 8, 0};
  float scf[40];
  for (int g = 0; g < ngr; g++) {
    for (int ch = 0; ch < nch; ch++) {
      const int32_t* p = gr_params + (int64_t)(g * nch + ch) * 21;
      GrInfo gr;
      gr.part_23_length = p[0];
      gr.big_values = p[1];
      gr.scalefac_compress = p[2];
      gr.global_gain = p[3];
      gr.block_type = p[4];
      gr.mixed_block_flag = p[5];
      gr.n_long_sfb = p[6];
      gr.n_short_sfb = p[7];
      for (int i = 0; i < 3; i++) {
        gr.table_select[i] = p[8 + i];
        gr.region_count[i] = p[11 + i];
        gr.subblock_gain[i] = p[14 + i];
      }
      gr.preflag = p[17];
      gr.scalefac_scale = p[18];
      gr.count1_table = p[19];
      gr.scfsi = p[20];
      const uint8_t* sfb = sfbtabs + (int64_t)(g * nch + ch) * 40;
      gr.sfbtab = sfb;
      int64_t limit = br.pos + gr.part_23_length;
      mp3_scalefactors(hdr4, ist_pos + ch * 40, &br, &gr, ch, scf);
      int32_t ts[3] = {gr.table_select[0], gr.table_select[1],
                       gr.table_select[2]};
      int32_t rc[3] = {gr.region_count[0], gr.region_count[1],
                       gr.region_count[2]};
      uint8_t sfb48[48];
      memset(sfb48, 0, sizeof(sfb48));
      memcpy(sfb48, sfb, 40);
      int64_t end = af_mp3_huffman(
          maindata, maindata_len, br.pos, limit, ts, rc, sfb48, scf,
          gr.big_values, gr.count1_table,
          q_out + (int64_t)(g * nch + ch) * 576,
          gain_out + (int64_t)(g * nch + ch) * 576);
      if (end < 0) return -1;
      br.pos = limit;
    }
    memcpy(ist_snapshot + (int64_t)g * 40, ist_pos + (nch - 1) * 40,
           40 * sizeof(int32_t));
  }
  return 0;
}


// ---------------------------------------------------------------------------
// Full MP3 window parse: header walk + side info + reservoir + scalefactors
// + Huffman + stereo-mix/reorder/window tensor assembly for up to W frames
// of ONE stream in a single call (replaces ~30 Python/ctypes round trips
// per frame in the lockstep batch scheduler).
// ---------------------------------------------------------------------------

static const int kHz[3] = {44100, 48000, 32000};
static const int kHalfRate[2][3][15] = {
    {{0, 4, 8, 12, 16, 20, 24, 28, 32, 40, 48, 56, 64, 72, 80},
     {0, 4, 8, 12, 16, 20, 24, 28, 32, 40, 48, 56, 64, 72, 80},
     {0, 16, 24, 28, 32, 40, 48, 56, 64, 72, 80, 88, 96, 112, 128}},
    {{0, 16, 20, 24, 28, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160},
     {0, 16, 24, 28, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192},
     {0, 16, 32, 48, 64, 80, 96, 112, 128, 144, 160, 176, 192, 208, 224}}};

static inline int hdr_valid(const uint8_t* h) {
  return h[0] == 0xFF &&
         ((h[1] & 0xF0) == 0xF0 || (h[1] & 0xFE) == 0xE2) &&
         (((h[1] >> 1) & 3) != 0) && ((h[2] >> 4) != 15) &&
         (((h[2] >> 2) & 3) != 3);
}

static inline int hdr_compare(const uint8_t* h1, const uint8_t* h2) {
  return hdr_valid(h2) && (((h1[1] ^ h2[1]) & 0xFE) == 0) &&
         (((h1[2] ^ h2[2]) & 0x0C) == 0) &&
         ((((h1[2] & 0xF0) == 0) ? 1 : 0) == (((h2[2] & 0xF0) == 0) ? 1 : 0));
}

static inline int hdr_sample_rate(const uint8_t* h) {
  int hz = kHz[(h[2] >> 2) & 3];
  if (!(h[1] & 0x8)) hz >>= 1;
  if (!(h[1] & 0x10)) hz >>= 1;
  return hz;
}

static inline int hdr_frame_samples(const uint8_t* h) {
  if ((h[1] & 6) == 6) return 384;
  return 1152 >> (((h[1] & 14) == 2) ? 1 : 0);
}

static inline int hdr_frame_bytes(const uint8_t* h, int free_format) {
  int kbps =
      2 * kHalfRate[(h[1] & 0x8) ? 1 : 0][((h[1] >> 1) & 3) - 1][h[2] >> 4];
  int fb = (int)((int64_t)hdr_frame_samples(h) * kbps * 125 /
                 hdr_sample_rate(h));
  if ((h[1] & 6) == 6) fb &= ~3;
  return fb ? fb : free_format;
}

static inline int hdr_padding(const uint8_t* h) {
  if (h[2] & 0x2) return ((h[1] & 6) == 6) ? 4 : 1;
  return 0;
}

// intensity pan gains (minimp3.d:930-952)
static void mp3_pan_gains(int ipos, int mpeg1, int mpeg2_sh, float* kl,
                          float* kr) {
  static const float pan[14] = {
      0.0f, 1.0f, 0.21132487f, 0.78867513f, 0.36602540f, 0.63397460f,
      0.5f, 0.5f, 0.63397460f, 0.36602540f, 0.78867513f, 0.21132487f,
      1.0f, 0.0f};
  if (mpeg1) {
    *kl = pan[2 * ipos];
    *kr = pan[2 * ipos + 1];
    return;
  }
  float k = (float)exp2(-((double)(((ipos + 1) >> 1) << mpeg2_sh)) / 4.0);
  if (ipos & 1) {
    *kl = k;
    *kr = 1.0f;
  } else {
    *kl = 1.0f;
    *kr = k;
  }
}

// per-coefficient stereo mix (a,b,c,d) vectors (mirrors models/mp3.py
// _stereo_mix; minimp3.d L3_intensity_stereo/L3_midside_stereo semantics)
static void mp3_stereo_mix(const uint8_t* h, const GrInfo* gch,
                           const GrInfo* gr_pair, const int32_t* q_right,
                           const int32_t* ist_pos_right, float* mix
                           /* [4*576] */) {
  for (int i = 0; i < 576; i++) {
    mix[i] = 1.0f;
    mix[576 + i] = 0.0f;
    mix[1152 + i] = 0.0f;
    mix[1728 + i] = 1.0f;
  }
  int mpeg1 = h[1] & 0x8;
  int i_stereo = h[3] & 0x10;
  int ms_flag = h[3] & 0x20;
  int is_ms = (h[3] & 0xE0) == 0x60;
  if (i_stereo) {
    const uint8_t* tab = gch->sfbtab;
    uint8_t sfb[48];
    memset(sfb, 0, sizeof(sfb));
    memcpy(sfb, tab, gch->n_short_sfb ? 40 : 23);
    int n_sfb = gch->n_long_sfb + gch->n_short_sfb;
    int max_blocks = gch->n_short_sfb ? 3 : 1;
    int max_band[3] = {-1, -1, -1};
    int p = 0;
    for (int i = 0; i < n_sfb; i++) {
      int w = sfb[i];
      int any = 0;
      for (int j = 0; j < w; j++) any |= (q_right[p + j] != 0);
      if (any) max_band[i % 3] = i;
      p += w;
    }
    if (gch->n_long_sfb) {
      int m = max_band[0];
      if (max_band[1] > m) m = max_band[1];
      if (max_band[2] > m) m = max_band[2];
      max_band[0] = max_band[1] = max_band[2] = m;
    }
    int32_t ist[40];
    memcpy(ist, ist_pos_right, 40 * sizeof(int32_t));
    int default_pos = mpeg1 ? 3 : 0;
    for (int i = 0; i < max_blocks; i++) {
      int itop = n_sfb - max_blocks + i;
      int prev = itop - max_blocks;
      ist[itop] = (max_band[i] >= prev) ? default_pos : ist[prev];
    }
    int max_pos = mpeg1 ? 7 : 64;
    int mpeg2_sh = gr_pair->scalefac_compress & 1;
    float s = ms_flag ? 1.41421356f : 1.0f;
    p = 0;
    for (int i = 0; sfb[i]; i++) {
      int w = sfb[i];
      int ipos = ist[i];
      if (i > max_band[i % 3] && ipos < max_pos) {
        float kl, kr;
        mp3_pan_gains(ipos, mpeg1 ? 1 : 0, mpeg2_sh, &kl, &kr);
        for (int j = 0; j < w && p + j < 576; j++) {
          mix[p + j] = kl * s;
          mix[576 + p + j] = 0.0f;
          mix[1152 + p + j] = kr * s;
          mix[1728 + p + j] = 0.0f;
        }
      } else if (ms_flag) {
        for (int j = 0; j < w && p + j < 576; j++) {
          mix[p + j] = 1.0f;
          mix[576 + p + j] = 1.0f;
          mix[1152 + p + j] = 1.0f;
          mix[1728 + p + j] = -1.0f;
        }
      }
      p += w;
    }
  } else if (is_ms) {
    for (int i = 0; i < 576; i++) {
      mix[i] = 1.0f;
      mix[576 + i] = 1.0f;
      mix[1152 + i] = 1.0f;
      mix[1728 + i] = -1.0f;
    }
  }
}

// short-block reorder permutation (models/mp3.py _reorder_perm_full;
// minimp3.d:984-1000): new[i] = old[perm[i]]
static void mp3_reorder_perm(const GrInfo* gr, int n_long_bands,
                             int32_t* perm /* [576] */) {
  for (int i = 0; i < 576; i++) perm[i] = i;
  if (!gr->n_short_sfb) return;
  int src = n_long_bands * 18;
  int dst = src;
  uint8_t sfb[48];
  memset(sfb, 0, sizeof(sfb));
  memcpy(sfb, gr->sfbtab, 40);
  int i = gr->n_long_sfb;
  while (sfb[i]) {
    int len = sfb[i];
    for (int j = 0; j < len; j++) {
      if (dst + 3 > 576 || src + 2 * len + j >= 576) return;
      perm[dst] = src + j;
      perm[dst + 1] = src + len + j;
      perm[dst + 2] = src + 2 * len + j;
      dst += 3;
    }
    src += 3 * len;
    i += 3;
  }
}

enum { WIN_NORMAL = 0, WIN_START = 1, WIN_SHORT = 2, WIN_STOP = 3 };

// Parse up to max_frames frames of one stream starting at byte `off`.
// Writes window tensors at frame slots [0, n).  Returns the number of
// frames CONSUMED (>= number decoded; silent frames consume but emit
// flags=0), or 0 at EOF/stream mismatch.  State in/out: reservoir buffer
// (511 bytes) + length, ist_pos [2*40].
int af_mp3_parse_window(
    const uint8_t* data, int64_t nbytes, int64_t off, const uint8_t* hdr0,
    int32_t max_frames, int32_t free_format_bytes,
    uint8_t* reserv_buf /* [511] */, int32_t* reserv_len,
    int32_t* ist_pos /* [2*40] */,
    float* xq_out /* [W, ngr, nch, 576]: sign(q)*|q|^(4/3)*gain, the
                      requantized spectrum (device dequant fused here) */,
    float* mix_out /* [W, ngr, 4, 576] */,
    int32_t* perm_out /* [W, ngr, nch, 576] */,
    int32_t* aa_out /* [W, ngr, nch] */,
    int32_t* wt_out /* [W, ngr, nch, 32] */,
    uint8_t* flags /* [W]: bit0 = has output, bit1 = has short blocks */,
    int64_t* new_off) {
  int mpeg1 = hdr0[1] & 0x8;
  int nch = ((hdr0[3] & 0xC0) == 0xC0) ? 1 : 2;
  int ngr = mpeg1 ? 2 : 1;
  int sr_idx_my =
      (((hdr0[2] >> 2) & 3) + (((hdr0[1] >> 3) & 1) + ((hdr0[1] >> 4) & 1)) * 3);
  int n_long_bands_base = (sr_idx_my == 2) ? 4 : 2;  // mixed<<(idx==2)
  uint8_t maindata[4608];
  int32_t q_i[576];
  float gains_l[576];
  float scf[40];
  // |q|^(4/3) lookup for small magnitudes (covers virtually all samples)
  static float pow43[256];
  static int pow43_init = 0;
  if (!pow43_init) {
    for (int i = 0; i < 256; i++) pow43[i] = (float)pow((double)i, 4.0 / 3.0);
    pow43_init = 1;
  }
  int w = 0;
  for (; w < max_frames; w++) {
    flags[w] = 0;
    if (off + 4 > nbytes) break;
    const uint8_t* h = data + off;
    if (!hdr_compare(hdr0, h)) break;
    int fb = hdr_frame_bytes(h, free_format_bytes) + hdr_padding(h);
    if (fb <= 4 || off + fb > nbytes) break;
    Mp3Bits bs = {data + off + 4, 0, (fb - 4) * 8};
    if (!(h[1] & 1)) mp3_get(&bs, 16);
    GrInfo grs[4];
    int main_data_begin = mp3_side_info(&bs, grs, h);
    if (main_data_begin < 0) {
      // corrupt side info: reset reservoir/scalefactor state, consume frame
      *reserv_len = 0;
      memset(ist_pos, 0, 80 * sizeof(int32_t));
      off += fb;
      continue;
    }
    int side_bytes = (int)(bs.pos / 8);
    const uint8_t* frame_main = data + off + 4 + side_bytes;
    int frame_main_len = fb - 4 - side_bytes;
    int have = *reserv_len < main_data_begin ? *reserv_len : main_data_begin;
    int md_len = have + frame_main_len;
    if (md_len > (int)sizeof(maindata)) { break; }
    if (have)
      memcpy(maindata, reserv_buf + *reserv_len - have, have);
    memcpy(maindata + have, frame_main, frame_main_len);
    int success = (*reserv_len >= main_data_begin);

    int64_t br_pos = 0;
    if (success) {
      int frame_short = 0;
      for (int g = 0; g < ngr; g++) {
        int32_t ist_snapshot[40];
        for (int ch = 0; ch < nch; ch++) {
          GrInfo* gr = &grs[g * nch + ch];
          BitReader br = {maindata, (int64_t)md_len * 8, br_pos};
          int64_t limit = br_pos + gr->part_23_length;
          mp3_scalefactors(h, ist_pos + ch * 40, &br, gr, ch, scf);
          int32_t ts[3] = {gr->table_select[0], gr->table_select[1],
                           gr->table_select[2]};
          int32_t rc[3] = {gr->region_count[0], gr->region_count[1],
                           gr->region_count[2]};
          uint8_t sfb48[48];
          memset(sfb48, 0, sizeof(sfb48));
          memcpy(sfb48, gr->sfbtab, gr->n_short_sfb ? 40 : 23);
          float* qd =
              xq_out + (((int64_t)w * ngr + g) * nch + ch) * 576;
          int64_t end = af_mp3_huffman(maindata, md_len, br.pos, limit, ts,
                                       rc, sfb48, scf, gr->big_values,
                                       gr->count1_table, q_i, gains_l);
          if (end < 0) {
            success = 0;
            break;
          }
          for (int i = 0; i < 576; i++) {
            int v = q_i[i];
            int m = v < 0 ? -v : v;
            float p = (m < 256) ? pow43[m] : (float)pow((double)m, 4.0 / 3.0);
            qd[i] = (v < 0 ? -p : p) * gains_l[i];
          }
          br_pos = limit;
          // assembly: aa bands / reorder perm / window types
          int n_long_bands =
              gr->mixed_block_flag ? n_long_bands_base : 0;
          int32_t* pd =
              perm_out + (((int64_t)w * ngr + g) * nch + ch) * 576;
          int32_t* wd = wt_out + (((int64_t)w * ngr + g) * nch + ch) * 32;
          if (gr->n_short_sfb) {
            flags[w] |= 2;
            frame_short = 1;
            aa_out[((int64_t)w * ngr + g) * nch + ch] = n_long_bands - 1;
            mp3_reorder_perm(gr, n_long_bands, pd);
            for (int i = 0; i < 32; i++)
              wd[i] = (i < n_long_bands) ? WIN_NORMAL : WIN_SHORT;
          } else {
            aa_out[((int64_t)w * ngr + g) * nch + ch] = 31;
            for (int i = 0; i < 576; i++) pd[i] = i;
            int wt = WIN_NORMAL;
            if (gr->block_type == 3) wt = WIN_STOP;
            else if (gr->block_type == 1) wt = WIN_START;
            for (int i = 0; i < 32; i++) wd[i] = wt;
          }
        }
        if (!success) break;
        memcpy(ist_snapshot, ist_pos + (nch - 1) * 40, 40 * sizeof(int32_t));
        // stereo mix for this granule
        float* md = mix_out + (((int64_t)w * ngr + g) * 4) * 576;
        if (nch == 2) {
          mp3_stereo_mix(h, &grs[g * nch], &grs[g * nch + 1], q_i,
                         ist_snapshot, md);
        } else {
          for (int i = 0; i < 576; i++) {
            md[i] = 1.0f;
            md[576 + i] = 0.0f;
            md[1152 + i] = 0.0f;
            md[1728 + i] = 1.0f;
          }
        }
      }
      if (success) flags[w] |= 1;
    }
    // reservoir save (L3_save_reservoir)
    int pos_bytes = success ? (int)((br_pos + 7) / 8) : 0;
    int remains = md_len - pos_bytes;
    if (remains > 511) {
      pos_bytes += remains - 511;
      remains = 511;
    }
    if (remains < 0) remains = 0;
    memmove(reserv_buf, maindata + pos_bytes, remains);
    *reserv_len = remains;
    off += fb;
  }
  *new_off = off;
  return w;
}

}  // extern "C"
