/* Conformance-fixture tool for graft's arithmetic-coded JPEG support.
 *
 * Uses the SYSTEM libjpeg62-turbo (an independent, conformant T.81
 * implementation) to (a) encode raw PGM/PPM rasters as arithmetic-coded
 * JPEG (sequential or progressive, optional restart interval, optional
 * chroma subsampling) and (b) decode any JPEG back to PGM/PPM. The
 * fixtures it produces are embedded in JpegCodecSpec so the Scala
 * codec's arithmetic mode is pinned against an EXTERNAL decoder and
 * encoder, not just its own round-trip (the r16 ADVICE lesson: shared
 * encode/decode code can round-trip despite non-conformance).
 *
 * Build: gcc -O2 -o jpegarith jpegarith.c -ljpeg
 * Usage:
 *   jpegarith encode <in.pgm|in.ppm> <out.jpg> [quality] [restart] [prog] [subsamp]
 *     subsamp: 444 (default), 420, 422
 *   jpegarith decode <in.jpg> <out.pgm|out.ppm>
 * decode writes PGM for 1-component JPEGs, PPM for 3-component.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static unsigned char *read_pnm(const char *path, int *w, int *h, int *comps) {
  FILE *f = fopen(path, "rb");
  if (!f) { perror(path); exit(1); }
  char magic[3] = {0};
  int maxv;
  if (fscanf(f, "%2s %d %d %d", magic, w, h, &maxv) != 4) {
    fprintf(stderr, "bad pnm header in %s\n", path); exit(1);
  }
  fgetc(f); /* single whitespace after maxval */
  if (strcmp(magic, "P5") == 0) *comps = 1;
  else if (strcmp(magic, "P6") == 0) *comps = 3;
  else { fprintf(stderr, "unsupported pnm magic %s\n", magic); exit(1); }
  size_t n = (size_t)(*w) * (*h) * (*comps);
  unsigned char *buf = malloc(n);
  if (fread(buf, 1, n, f) != n) { fprintf(stderr, "short pnm read\n"); exit(1); }
  fclose(f);
  return buf;
}

static void write_pnm(const char *path, int w, int h, int comps,
                      const unsigned char *px) {
  FILE *f = fopen(path, "wb");
  if (!f) { perror(path); exit(1); }
  fprintf(f, "%s\n%d %d\n255\n", comps == 1 ? "P5" : "P6", w, h);
  fwrite(px, 1, (size_t)w * h * comps, f);
  fclose(f);
}

static int cmd_encode(int argc, char **argv) {
  int w, h, comps;
  unsigned char *px = read_pnm(argv[2], &w, &h, &comps);
  int quality = argc > 4 ? atoi(argv[4]) : 90;
  int restart = argc > 5 ? atoi(argv[5]) : 0;
  int prog = argc > 6 ? atoi(argv[6]) : 0;
  int subsamp = argc > 7 ? atoi(argv[7]) : 444;

  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  FILE *out = fopen(argv[3], "wb");
  if (!out) { perror(argv[3]); exit(1); }
  jpeg_stdio_dest(&cinfo, out);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = comps;
  cinfo.in_color_space = comps == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  cinfo.arith_code = TRUE;           /* the mode under test */
  cinfo.restart_interval = restart;
  if (prog) jpeg_simple_progression(&cinfo);
  if (comps == 3) {
    if (subsamp == 420) {
      cinfo.comp_info[0].h_samp_factor = 2; cinfo.comp_info[0].v_samp_factor = 2;
    } else if (subsamp == 422) {
      cinfo.comp_info[0].h_samp_factor = 2; cinfo.comp_info[0].v_samp_factor = 1;
    } else if (subsamp == 411) {
      cinfo.comp_info[0].h_samp_factor = 4; cinfo.comp_info[0].v_samp_factor = 1;
    } else if (subsamp == 410) {
      cinfo.comp_info[0].h_samp_factor = 4; cinfo.comp_info[0].v_samp_factor = 2;
    } else {
      cinfo.comp_info[0].h_samp_factor = 1; cinfo.comp_info[0].v_samp_factor = 1;
    }
    cinfo.comp_info[1].h_samp_factor = 1; cinfo.comp_info[1].v_samp_factor = 1;
    cinfo.comp_info[2].h_samp_factor = 1; cinfo.comp_info[2].v_samp_factor = 1;
  }
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = px + (size_t)cinfo.next_scanline * w * comps;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  fclose(out);
  jpeg_destroy_compress(&cinfo);
  free(px);
  return 0;
}

static int cmd_decode(int argc, char **argv) {
  (void)argc;
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  FILE *in = fopen(argv[2], "rb");
  if (!in) { perror(argv[2]); exit(1); }
  jpeg_stdio_src(&cinfo, in);
  jpeg_read_header(&cinfo, TRUE);
  /* pixel-exact comparability with graft's decoder: no fancy upsampling
   * (graft replicates samples), float DCT for best accuracy */
  cinfo.do_fancy_upsampling = FALSE;
  cinfo.dct_method = JDCT_ISLOW;
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height,
      comps = cinfo.output_components;
  unsigned char *px = malloc((size_t)w * h * comps);
  while (cinfo.output_scanline < (unsigned)h) {
    JSAMPROW row = px + (size_t)cinfo.output_scanline * w * comps;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(in);
  write_pnm(argv[3], w, h, comps, px);
  free(px);
  return 0;
}

/* Entropy-transcode: re-encode the SAME quantized coefficients with the
 * other entropy coder (arith <-> Huffman), no dequant/IDCT involved.
 * Decoding the transcoded file and the original must give IDENTICAL
 * rasters under ANY conformant decoder — this is the exact,
 * IDCT-independent pin for the arithmetic entropy layer. */
static int cmd_transcode(int argc, char **argv) {
  int to_arith = argc > 4 ? atoi(argv[4]) : 0;
  struct jpeg_decompress_struct din;
  struct jpeg_compress_struct cout;
  struct jpeg_error_mgr jerr1, jerr2;
  din.err = jpeg_std_error(&jerr1);
  jpeg_create_decompress(&din);
  FILE *in = fopen(argv[2], "rb");
  if (!in) { perror(argv[2]); exit(1); }
  jpeg_stdio_src(&din, in);
  jpeg_read_header(&din, TRUE);
  jvirt_barray_ptr *coefs = jpeg_read_coefficients(&din);

  cout.err = jpeg_std_error(&jerr2);
  jpeg_create_compress(&cout);
  jpeg_copy_critical_parameters(&din, &cout);
  cout.arith_code = to_arith ? TRUE : FALSE;
  cout.optimize_coding = to_arith ? FALSE : TRUE;
  FILE *out = fopen(argv[3], "wb");
  if (!out) { perror(argv[3]); exit(1); }
  jpeg_stdio_dest(&cout, out);
  jpeg_write_coefficients(&cout, coefs);
  jpeg_finish_compress(&cout);
  jpeg_destroy_compress(&cout);
  jpeg_finish_decompress(&din);
  jpeg_destroy_decompress(&din);
  fclose(in);
  fclose(out);
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 4 && strcmp(argv[1], "encode") == 0) return cmd_encode(argc, argv);
  if (argc >= 4 && strcmp(argv[1], "decode") == 0) return cmd_decode(argc, argv);
  if (argc >= 4 && strcmp(argv[1], "transcode") == 0) return cmd_transcode(argc, argv);
  fprintf(stderr,
      "usage: jpegarith encode <in.pnm> <out.jpg> [quality] [restart] [prog] [subsamp]\n"
      "       jpegarith decode <in.jpg> <out.pnm>\n"
      "       jpegarith transcode <in.jpg> <out.jpg> [to_arith]\n");
  return 2;
}
