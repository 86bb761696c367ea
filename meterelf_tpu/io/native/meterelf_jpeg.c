/* meterelf_jpeg.c — native JPEG decode for the meterelf-tpu input pipeline.
 *
 * Replaces the reference's cv2.imread JPEG path (reference:
 * meterelf/_image.py:49) with a standalone libjpeg(-turbo) decoder whose
 * numerics are configurable (DCT method, fancy/faithful chroma upsampling)
 * so the decoded pixels can be matched bit-for-bit against the golden
 * outputs produced by the 2019 opencv-python==3.4.5.20 wheel (see
 * SURVEY.md §8: the goldens embed that wheel's JPEG decoder output).
 *
 * Design notes:
 *  - Warnings (e.g. "Premature end of JPEG file" on the corrupt sample
 *    frames) are swallowed: the reference requires stderr to be empty and
 *    partial decodes to succeed (integration-tests/test_all_sample_images
 *    expects exit 0 + empty stderr with 2 corrupt inputs).
 *  - Errors longjmp out and return nonzero; caller maps that to the
 *    ImageLoadingError path.
 *  - Batch API decodes many files concurrently with pthreads, writing
 *    directly into a caller-provided packed buffer (the host staging
 *    buffer that feeds the TPU), so Python threads/GIL never touch pixel
 *    data.
 */

#include <setjmp.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <pthread.h>

#include <jpeglib.h>

typedef struct {
    struct jpeg_error_mgr pub;
    jmp_buf setjmp_buffer;
} mej_error_mgr;

static void mej_error_exit(j_common_ptr cinfo)
{
    mej_error_mgr *err = (mej_error_mgr *)cinfo->err;
    longjmp(err->setjmp_buffer, 1);
}

static void mej_emit_message(j_common_ptr cinfo, int msg_level)
{
    (void)cinfo;
    (void)msg_level; /* swallow warnings: stderr must stay empty */
}

static void mej_output_message(j_common_ptr cinfo)
{
    (void)cinfo;
}

/* Decode options. dct_method: 0=ISLOW 1=IFAST 2=FLOAT (mirrors J_DCT_METHOD).
 * fancy_upsampling: 0/1. out_bgr: 1 => BGR channel order (like cv2.imread),
 * 0 => RGB. */
typedef struct {
    int dct_method;
    int fancy_upsampling;
    int out_bgr;
} mej_opts;

/* Decode a JPEG from memory into out (row-major H*W*3, channel order per
 * opts). out must hold max_w*max_h*3 bytes. Returns 0 on success and sets
 * *out_w/*out_h. Nonzero on failure. Partial decodes (truncated files)
 * succeed; undecoded regions keep libjpeg's fill. */
int mej_decode(const unsigned char *data, unsigned long size,
               unsigned char *out, int max_w, int max_h,
               int *out_w, int *out_h, const mej_opts *opts)
{
    struct jpeg_decompress_struct cinfo;
    mej_error_mgr jerr;

    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = mej_error_exit;
    jerr.pub.emit_message = mej_emit_message;
    jerr.pub.output_message = mej_output_message;

    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }

    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, size);
    jpeg_read_header(&cinfo, TRUE);

    cinfo.dct_method = (J_DCT_METHOD)opts->dct_method;
    cinfo.do_fancy_upsampling = opts->fancy_upsampling ? TRUE : FALSE;
    if (cinfo.jpeg_color_space == JCS_GRAYSCALE) {
        /* cv2.imread returns 3-channel BGR even for grayscale JPEGs */
        cinfo.out_color_space = JCS_GRAYSCALE;
    } else {
        cinfo.out_color_space = opts->out_bgr ? JCS_EXT_BGR : JCS_RGB;
    }

    jpeg_start_decompress(&cinfo);

    int w = (int)cinfo.output_width;
    int h = (int)cinfo.output_height;
    if (w > max_w || h > max_h) {
        jpeg_destroy_decompress(&cinfo);
        return 2;
    }
    *out_w = w;
    *out_h = h;

    int gray = (cinfo.out_color_space == JCS_GRAYSCALE);
    JSAMPROW rowbuf = NULL;
    if (gray) {
        rowbuf = (JSAMPROW)malloc((size_t)w);
        if (!rowbuf) {
            jpeg_destroy_decompress(&cinfo);
            return 3;
        }
    }

    while (cinfo.output_scanline < cinfo.output_height) {
        unsigned char *dst = out + (size_t)cinfo.output_scanline * w * 3;
        if (gray) {
            JSAMPROW rows[1] = {rowbuf};
            jpeg_read_scanlines(&cinfo, rows, 1);
            for (int x = 0; x < w; x++) {
                dst[3 * x + 0] = rowbuf[x];
                dst[3 * x + 1] = rowbuf[x];
                dst[3 * x + 2] = rowbuf[x];
            }
        } else {
            JSAMPROW rows[1] = {dst};
            jpeg_read_scanlines(&cinfo, rows, 1);
        }
    }

    if (rowbuf)
        free(rowbuf);
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

/* ---------------- region decode (meter-rect fast path) ----------------
 *
 * Decodes only the scanline/column band containing a requested region,
 * via libjpeg-turbo's jpeg_crop_scanline + jpeg_skip_scanlines. IDCT and
 * upsampling run only for the included iMCU band (~26% of the work for
 * the reference's 250x250 rect in a 640x480 frame). A 16-pixel margin on
 * every side keeps fancy chroma upsampling's neighbor context, so the
 * returned region is byte-identical to a full decode (validated over the
 * whole sample corpus, tests/test_io.py); callers fall back to
 * mej_decode on any failure. */
#define MEJ_REGION_MARGIN 16

int mej_decode_region(const unsigned char *data, unsigned long size,
                      unsigned char *out, int rx, int ry, int rw, int rh,
                      int *out_w, int *out_h, const mej_opts *opts)
{
    struct jpeg_decompress_struct cinfo;
    mej_error_mgr jerr;
    JSAMPROW rowbuf = NULL;

    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = mej_error_exit;
    jerr.pub.emit_message = mej_emit_message;
    jerr.pub.output_message = mej_output_message;

    if (setjmp(jerr.setjmp_buffer)) {
        if (rowbuf)
            free(rowbuf);
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }

    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, size);
    jpeg_read_header(&cinfo, TRUE);

    cinfo.dct_method = (J_DCT_METHOD)opts->dct_method;
    cinfo.do_fancy_upsampling = opts->fancy_upsampling ? TRUE : FALSE;
    int gray = (cinfo.jpeg_color_space == JCS_GRAYSCALE);
    cinfo.out_color_space =
        gray ? JCS_GRAYSCALE : (opts->out_bgr ? JCS_EXT_BGR : JCS_RGB);

    jpeg_start_decompress(&cinfo);

    int w = (int)cinfo.output_width;
    int h = (int)cinfo.output_height;
    *out_w = w;
    *out_h = h;
    if (rx < 0 || ry < 0 || rx + rw > w || ry + rh > h) {
        jpeg_abort_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        return 4; /* region outside image: caller falls back */
    }

    /* horizontal crop with margin; the library aligns to iMCU bounds */
    JDIMENSION xoff = rx > MEJ_REGION_MARGIN ? rx - MEJ_REGION_MARGIN : 0;
    JDIMENSION xw = rx + rw + MEJ_REGION_MARGIN > w
        ? (JDIMENSION)w - xoff : rx + rw + MEJ_REGION_MARGIN - xoff;
    jpeg_crop_scanline(&cinfo, &xoff, &xw);
    int band_w = (int)cinfo.output_width;    /* = xw after adjustment */
    int col0 = rx - (int)xoff;

    /* vertical skip with margin */
    int y_skip = ry > MEJ_REGION_MARGIN ? ry - MEJ_REGION_MARGIN : 0;
    if (y_skip > 0)
        jpeg_skip_scanlines(&cinfo, (JDIMENSION)y_skip);

    int nch = gray ? 1 : 3;
    rowbuf = (JSAMPROW)malloc((size_t)band_w * nch);
    if (!rowbuf) {
        jpeg_abort_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        return 3;
    }

    int y_end = ry + rh;
    while ((int)cinfo.output_scanline < y_end) {
        int y = (int)cinfo.output_scanline;
        JSAMPROW rows[1] = {rowbuf};
        jpeg_read_scanlines(&cinfo, rows, 1);
        if (y < ry)
            continue; /* margin row */
        unsigned char *dst = out + (size_t)(y - ry) * rw * 3;
        if (gray) {
            for (int x = 0; x < rw; x++) {
                unsigned char v = rowbuf[col0 + x];
                dst[3 * x + 0] = v;
                dst[3 * x + 1] = v;
                dst[3 * x + 2] = v;
            }
        } else {
            memcpy(dst, rowbuf + (size_t)col0 * 3, (size_t)rw * 3);
        }
    }

    free(rowbuf);
    rowbuf = NULL;
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

/* ---------------- batch decode (threaded host feeder) ---------------- */

typedef struct {
    const unsigned char *const *datas;
    const unsigned long *sizes;
    unsigned char *out;       /* N * max_h * max_w * 3, pre-zeroed by caller */
    int *ok;                  /* N: 0 = success */
    int *widths;              /* N */
    int *heights;             /* N */
    int max_w, max_h;
    int n;
    const mej_opts *opts;
    int next;                 /* work queue cursor */
    pthread_mutex_t lock;
} mej_batch_job;

static void *mej_batch_worker(void *arg)
{
    mej_batch_job *job = (mej_batch_job *)arg;
    size_t img_stride = (size_t)job->max_w * job->max_h * 3;
    for (;;) {
        pthread_mutex_lock(&job->lock);
        int i = job->next++;
        pthread_mutex_unlock(&job->lock);
        if (i >= job->n)
            break;
        job->ok[i] = mej_decode(job->datas[i], job->sizes[i],
                                job->out + (size_t)i * img_stride,
                                job->max_w, job->max_h,
                                &job->widths[i], &job->heights[i], job->opts);
    }
    return NULL;
}

/* Decode n JPEGs concurrently with num_threads workers. Outputs are packed
 * at stride max_h*max_w*3; images smaller than (max_h, max_w) leave the
 * remainder of their slot untouched (caller pre-zeroes). */
void mej_decode_batch(const unsigned char *const *datas,
                      const unsigned long *sizes, int n,
                      unsigned char *out, int max_w, int max_h,
                      int *ok, int *widths, int *heights,
                      int dct_method, int fancy_upsampling, int out_bgr,
                      int num_threads)
{
    mej_opts opts = {dct_method, fancy_upsampling, out_bgr};
    mej_batch_job job;
    job.datas = datas;
    job.sizes = sizes;
    job.out = out;
    job.ok = ok;
    job.widths = widths;
    job.heights = heights;
    job.max_w = max_w;
    job.max_h = max_h;
    job.n = n;
    job.opts = &opts;
    job.next = 0;
    pthread_mutex_init(&job.lock, NULL);

    if (num_threads < 1)
        num_threads = 1;
    if (num_threads > n)
        num_threads = n;
    pthread_t threads[64];
    if (num_threads > 64)
        num_threads = 64;

    for (int t = 0; t < num_threads; t++)
        pthread_create(&threads[t], NULL, mej_batch_worker, &job);
    for (int t = 0; t < num_threads; t++)
        pthread_join(threads[t], NULL);
    pthread_mutex_destroy(&job.lock);
}

/* ------------- batched region decode (meter-rect feeder) ------------- */

typedef struct {
    const unsigned char *const *datas;
    const unsigned long *sizes;
    unsigned char *out;       /* N * rh * rw * 3 */
    int *ok;                  /* N: 0 = success (nonzero -> caller falls
                                 back to a full decode for that file) */
    int rx, ry, rw, rh;
    int n;
    const mej_opts *opts;
    int next;
    pthread_mutex_t lock;
} mej_region_job;

static void *mej_region_worker(void *arg)
{
    mej_region_job *job = (mej_region_job *)arg;
    size_t img_stride = (size_t)job->rw * job->rh * 3;
    int w, h;
    for (;;) {
        pthread_mutex_lock(&job->lock);
        int i = job->next++;
        pthread_mutex_unlock(&job->lock);
        if (i >= job->n)
            break;
        job->ok[i] = mej_decode_region(
            job->datas[i], job->sizes[i],
            job->out + (size_t)i * img_stride,
            job->rx, job->ry, job->rw, job->rh, &w, &h, job->opts);
    }
    return NULL;
}

void mej_decode_region_batch(const unsigned char *const *datas,
                             const unsigned long *sizes, int n,
                             unsigned char *out,
                             int rx, int ry, int rw, int rh,
                             int *ok,
                             int dct_method, int fancy_upsampling,
                             int out_bgr, int num_threads)
{
    mej_opts opts = {dct_method, fancy_upsampling, out_bgr};
    mej_region_job job;
    job.datas = datas;
    job.sizes = sizes;
    job.out = out;
    job.ok = ok;
    job.rx = rx;
    job.ry = ry;
    job.rw = rw;
    job.rh = rh;
    job.n = n;
    job.opts = &opts;
    job.next = 0;
    pthread_mutex_init(&job.lock, NULL);

    if (num_threads < 1)
        num_threads = 1;
    if (num_threads > n)
        num_threads = n;
    pthread_t threads[64];
    if (num_threads > 64)
        num_threads = 64;

    for (int t = 0; t < num_threads; t++)
        pthread_create(&threads[t], NULL, mej_region_worker, &job);
    for (int t = 0; t < num_threads; t++)
        pthread_join(threads[t], NULL);
    pthread_mutex_destroy(&job.lock);
}

/* Single-call region decode from a file path. */
int mej_decode_region_file(const char *path, unsigned char *out,
                           int rx, int ry, int rw, int rh,
                           int *out_w, int *out_h,
                           int dct_method, int fancy_upsampling, int out_bgr)
{
    FILE *fp = fopen(path, "rb");
    if (!fp)
        return 10;
    fseek(fp, 0, SEEK_END);
    long sz = ftell(fp);
    fseek(fp, 0, SEEK_SET);
    if (sz <= 0) {
        fclose(fp);
        return 11;
    }
    unsigned char *buf = (unsigned char *)malloc((size_t)sz);
    if (!buf) {
        fclose(fp);
        return 12;
    }
    if (fread(buf, 1, (size_t)sz, fp) != (size_t)sz) {
        free(buf);
        fclose(fp);
        return 13;
    }
    fclose(fp);
    mej_opts opts = {dct_method, fancy_upsampling, out_bgr};
    int rc = mej_decode_region(buf, (unsigned long)sz, out, rx, ry, rw, rh,
                               out_w, out_h, &opts);
    free(buf);
    return rc;
}

/* Single-call convenience: decode with explicit options, exposed for the
 * decode-parity sweep. */
int mej_decode_file_opts(const char *path, unsigned char *out,
                         int max_w, int max_h, int *out_w, int *out_h,
                         int dct_method, int fancy_upsampling, int out_bgr)
{
    FILE *fp = fopen(path, "rb");
    if (!fp)
        return 10;
    fseek(fp, 0, SEEK_END);
    long sz = ftell(fp);
    fseek(fp, 0, SEEK_SET);
    if (sz <= 0) {
        fclose(fp);
        return 11;
    }
    unsigned char *buf = (unsigned char *)malloc((size_t)sz);
    if (!buf) {
        fclose(fp);
        return 12;
    }
    if (fread(buf, 1, (size_t)sz, fp) != (size_t)sz) {
        free(buf);
        fclose(fp);
        return 13;
    }
    fclose(fp);
    mej_opts opts = {dct_method, fancy_upsampling, out_bgr};
    int rc = mej_decode(buf, (unsigned long)sz, out, max_w, max_h,
                        out_w, out_h, &opts);
    free(buf);
    return rc;
}

/* ----------- packed-i32 region decode (TPU staging feeder) ----------- */

#include <stdint.h>

/* Decode the region and pack BGR into one int32 word per pixel
 * (b | g<<8 | r<<16) directly into a [ph, pw] slot (region lands at
 * rows 0..rh-1, cols 0..rw-1; the caller pre-zeroes the padding) — the
 * decode graph's canonical staging layout, produced here so the host
 * never runs a separate numpy packing pass. */
static int mej_decode_region_packed(const unsigned char *data,
                                    unsigned long size,
                                    int32_t *out, int pw, int ph,
                                    int rx, int ry, int rw, int rh,
                                    const mej_opts *opts)
{
    if (rw > pw || rh > ph)
        return 5;
    unsigned char *tmp = (unsigned char *)malloc((size_t)rw * rh * 3);
    if (!tmp)
        return 3;
    int w, h;
    int rc = mej_decode_region(data, size, tmp, rx, ry, rw, rh,
                               &w, &h, opts);
    if (rc == 0) {
        for (int y = 0; y < rh; y++) {
            const unsigned char *src = tmp + (size_t)y * rw * 3;
            int32_t *dst = out + (size_t)y * pw;
            for (int x = 0; x < rw; x++)
                dst[x] = (int32_t)src[3 * x]
                       | ((int32_t)src[3 * x + 1] << 8)
                       | ((int32_t)src[3 * x + 2] << 16);
        }
    }
    free(tmp);
    return rc;
}

typedef struct {
    const unsigned char *const *datas;
    const unsigned long *sizes;
    int32_t *out;             /* N * ph * pw, pre-zeroed by caller */
    int *ok;                  /* N: 0 = success */
    int pw, ph;
    int rx, ry, rw, rh;
    int n;
    const mej_opts *opts;
    int next;
    pthread_mutex_t lock;
} mej_packed_job;

static void *mej_packed_worker(void *arg)
{
    mej_packed_job *job = (mej_packed_job *)arg;
    size_t img_stride = (size_t)job->pw * job->ph;
    for (;;) {
        pthread_mutex_lock(&job->lock);
        int i = job->next++;
        pthread_mutex_unlock(&job->lock);
        if (i >= job->n)
            break;
        job->ok[i] = mej_decode_region_packed(
            job->datas[i], job->sizes[i],
            job->out + (size_t)i * img_stride, job->pw, job->ph,
            job->rx, job->ry, job->rw, job->rh, job->opts);
    }
    return NULL;
}

void mej_decode_region_batch_packed(const unsigned char *const *datas,
                                    const unsigned long *sizes, int n,
                                    int32_t *out, int pw, int ph,
                                    int rx, int ry, int rw, int rh,
                                    int *ok,
                                    int dct_method, int fancy_upsampling,
                                    int num_threads)
{
    mej_opts opts = {dct_method, fancy_upsampling, 1 /* BGR */};
    mej_packed_job job;
    job.datas = datas;
    job.sizes = sizes;
    job.out = out;
    job.ok = ok;
    job.pw = pw;
    job.ph = ph;
    job.rx = rx;
    job.ry = ry;
    job.rw = rw;
    job.rh = rh;
    job.n = n;
    job.opts = &opts;
    job.next = 0;
    pthread_mutex_init(&job.lock, NULL);

    if (num_threads < 1)
        num_threads = 1;
    if (num_threads > n)
        num_threads = n;
    pthread_t threads[64];
    if (num_threads > 64)
        num_threads = 64;

    for (int t = 0; t < num_threads; t++)
        pthread_create(&threads[t], NULL, mej_packed_worker, &job);
    for (int t = 0; t < num_threads; t++)
        pthread_join(threads[t], NULL);
    pthread_mutex_destroy(&job.lock);
}

/* ---------- DCT-coefficient window read (device back-half feed) ----------
 *
 * The host-side JPEG cost floor is the inherently sequential entropy
 * decode; everything after it (dequantize, IDCT, chroma upsampling,
 * YCbCr->BGR) is data-parallel integer math that belongs on the
 * accelerator. These functions entropy-decode only
 * (jpeg_read_coefficients) and ship a block-aligned window of raw DCT
 * coefficients + the quant tables; ops/jpegdec.py finishes the decode
 * inside the jitted graph with bit-exact libjpeg numerics (ISLOW IDCT,
 * fancy h2v2 upsampling, fixed-point color convert).
 *
 * Supported layout: 8-bit baseline (non-progressive, Huffman) 3-component
 * YCbCr with 4:2:0 sampling — the entire sample corpus. Anything else
 * returns nonzero and the caller falls back to the pixel-path decode.
 *
 * Window: [lby0, lby0+lbh) x [lbx0, lbx0+lbw) in luma block units, all
 * four values even so the window is chroma-block-aligned. Coefficients
 * and quant tables are in natural (raster) order, as libjpeg stores them.
 */

/* Suspending chunked source: hands the decoder SRC_CHUNK bytes at a
 * time and suspends between chunks, so the caller regains control to
 * check cinfo.input_iMCU_row and STOP the (inherently sequential)
 * entropy decode once the coefficient window's last iMCU row has been
 * consumed — rows below the window never get Huffman-decoded. On data
 * exhaustion it stages the same fake-EOI bytes jpeg_mem_src inserts,
 * so truncated files keep their zero-filled-tail behavior. */
#include <jpegint.h>   /* jpeg_d_coef_controller (coefficient access
                          while jpeg_read_coefficients is suspended) */

#define MEJ_SRC_CHUNK 4096

typedef struct {
    struct jpeg_source_mgr pub;
    const unsigned char *data;
    unsigned long size;
    unsigned long pos;
    long skip_pending;
    unsigned long chunk;      /* driver-tuned stage size */
    unsigned char *scratch;   /* tail + fake EOI for truncated streams */
    unsigned long scratch_len;
} mej_chunk_src;

static const JOCTET mej_fake_eoi[2] = {0xFF, JPEG_EOI};

static void mej_src_noop(j_decompress_ptr cinfo) { (void)cinfo; }

static boolean mej_src_fill(j_decompress_ptr cinfo)
{
    (void)cinfo;
    return FALSE; /* always suspend: the driver loop stages chunks */
}

static void mej_src_skip(j_decompress_ptr cinfo, long num)
{
    mej_chunk_src *src = (mej_chunk_src *)cinfo->src;
    if (num <= 0)
        return;
    if ((size_t)num <= src->pub.bytes_in_buffer) {
        src->pub.next_input_byte += num;
        src->pub.bytes_in_buffer -= (size_t)num;
    } else {
        src->skip_pending += num - (long)src->pub.bytes_in_buffer;
        src->pub.bytes_in_buffer = 0;
    }
}

/* Stage more input after a suspension. On suspension the decoder may
 * roll next_input_byte BACK to the start of the incomplete entropy row
 * (jdhuff restores its row-start checkpoint), so unconsumed bytes must
 * stay visible: the window resumes at next_input_byte (which points
 * into our contiguous buffer) and is extended CHUNK bytes past the
 * previous high-water mark `pos`. Stages the same fake-EOI bytes
 * jpeg_mem_src inserts once real data is exhausted. */
static void mej_src_stage(mej_chunk_src *src)
{
    unsigned long resume = src->pos;
    if (src->pub.bytes_in_buffer > 0
        && src->pub.next_input_byte >= src->data
        && src->pub.next_input_byte < src->data + src->size)
        resume = (unsigned long)(src->pub.next_input_byte - src->data);
    if (src->scratch != NULL
        && src->pub.next_input_byte >= src->scratch
        && src->pub.next_input_byte < src->scratch + src->scratch_len) {
        /* rolled back INTO the scratch tail: re-present its suffix
         * (it already ends with the fake EOI) instead of dropping the
         * unconsumed tail bytes */
        return;
    }
    while (src->skip_pending > 0 && resume < src->size) {
        unsigned long step = src->size - resume;
        if ((unsigned long)src->skip_pending < step)
            step = (unsigned long)src->skip_pending;
        resume += step;
        src->skip_pending -= (long)step;
    }
    if (resume >= src->size) {
        src->pub.next_input_byte = mej_fake_eoi;
        src->pub.bytes_in_buffer = 2;
        return;
    }
    if (src->pos >= src->size) {
        /* Truncated stream: every real byte has been staged already and
         * the decoder still rolled back — the remaining tail alone can
         * never complete the suspended entropy row. Stage tail + fake
         * EOI CONTIGUOUSLY (what jpeg_mem_src's fill does): the decoder
         * sees the marker mid-row, enters insufficient-data mode, and
         * zero-fills the rest, matching the pixel path's behavior. */
        unsigned long tail = src->size - resume;
        if (src->scratch == NULL || src->scratch_len < tail + 2) {
            free(src->scratch);
            src->scratch = (unsigned char *)malloc(tail + 2);
            src->scratch_len = src->scratch ? tail + 2 : 0;
        }
        if (src->scratch == NULL) {  /* OOM: degrade to pure fake EOI */
            src->pub.next_input_byte = mej_fake_eoi;
            src->pub.bytes_in_buffer = 2;
            return;
        }
        memcpy(src->scratch, src->data + resume, tail);
        src->scratch[tail] = 0xFF;
        src->scratch[tail + 1] = JPEG_EOI;
        src->pub.next_input_byte = src->scratch;
        src->pub.bytes_in_buffer = tail + 2;
        return;
    }
    unsigned long tgt = (src->pos > resume ? src->pos : resume)
        + src->chunk;
    if (tgt > src->size)
        tgt = src->size;
    src->pub.next_input_byte = src->data + resume;
    src->pub.bytes_in_buffer = tgt - resume;
    src->pos = tgt;
}

static void mej_src_setup(j_decompress_ptr cinfo, mej_chunk_src *src,
                          const unsigned char *data, unsigned long size)
{
    src->pub.init_source = mej_src_noop;
    src->pub.fill_input_buffer = mej_src_fill;
    src->pub.skip_input_data = mej_src_skip;
    src->pub.resync_to_restart = jpeg_resync_to_restart;
    src->pub.term_source = mej_src_noop;
    src->pub.next_input_byte = NULL;
    src->pub.bytes_in_buffer = 0;
    src->data = data;
    src->size = size;
    src->pos = 0;
    src->skip_pending = 0;
    src->chunk = MEJ_SRC_CHUNK;
    src->scratch = NULL;
    src->scratch_len = 0;
    cinfo->src = &src->pub;
}

static int mej_read_coefs_region_inner(const unsigned char *data,
                                       unsigned long size,
                                       int lbx0, int lby0, int lbw, int lbh,
                                       int exp_w, int exp_h,
                                       int16_t *coefY, int16_t *coefCb,
                                       int16_t *coefCr,
                                       uint16_t *qt /* [3*64] */,
                                       mej_chunk_src *srcp)
{
    struct jpeg_decompress_struct cinfo;
    mej_error_mgr jerr;
#define src (*srcp)

    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = mej_error_exit;
    jerr.pub.emit_message = mej_emit_message;
    jerr.pub.output_message = mej_output_message;

    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }

    jpeg_create_decompress(&cinfo);
    mej_src_setup(&cinfo, &src, data, size);
    {
        /* bounded by total chunks + a safety margin for fake-EOI pulls */
        long guard = (long)(size / MEJ_SRC_CHUNK) + 1024;
        while (jpeg_read_header(&cinfo, TRUE) == JPEG_SUSPENDED) {
            mej_src_stage(&src);
            if (--guard < 0) {
                jpeg_destroy_decompress(&cinfo);
                return 14;
            }
        }
    }

    if (cinfo.num_components != 3
        || cinfo.jpeg_color_space != JCS_YCbCr
        || cinfo.progressive_mode || cinfo.arith_code
        || cinfo.data_precision != 8) {
        jpeg_destroy_decompress(&cinfo);
        return 6; /* unsupported layout: caller falls back */
    }
    {
        jpeg_component_info *c0 = &cinfo.comp_info[0];
        jpeg_component_info *c1 = &cinfo.comp_info[1];
        jpeg_component_info *c2 = &cinfo.comp_info[2];
        if (c0->h_samp_factor != 2 || c0->v_samp_factor != 2
            || c1->h_samp_factor != 1 || c1->v_samp_factor != 1
            || c2->h_samp_factor != 1 || c2->v_samp_factor != 1) {
            jpeg_destroy_decompress(&cinfo);
            return 6;
        }
    }
    if (exp_w > 0 && ((int)cinfo.image_width != exp_w
                      || (int)cinfo.image_height != exp_h)) {
        jpeg_destroy_decompress(&cinfo);
        return 5; /* unexpected frame size: edge-clamp geometry is static */
    }

    /* Entropy-decode ONLY the iMCU rows covering the window: resume
     * jpeg_read_coefficients chunk by chunk (the suspending source
     * returns control between chunks) and stop as soon as the window's
     * last iMCU row has been consumed — for the reference geometry this
     * skips the ~35% of Huffman work below the meter rect. */
    jvirt_barray_ptr *coefs = NULL;
    {
        int stop_imcu = (lby0 + lbh + 1) / 2;   /* iMCU rows = 16 px */
        long guard = (long)(size / MEJ_SRC_CHUNK)
            + 2 * (long)cinfo.total_iMCU_rows + 1024;
        for (;;) {
            coefs = jpeg_read_coefficients(&cinfo);
            if (coefs != NULL)
                break;                           /* reached EOI */
            if ((int)cinfo.input_iMCU_row >= stop_imcu) {
                coefs = cinfo.coef->coef_arrays; /* early stop */
                break;
            }
            mej_src_stage(&src);
            if (--guard < 0) {
                jpeg_destroy_decompress(&cinfo);
                return 14;
            }
        }
    }
    if (coefs == NULL) {
        jpeg_destroy_decompress(&cinfo);
        return 7;
    }

    {
        jpeg_component_info *c0 = &cinfo.comp_info[0];
        jpeg_component_info *c1 = &cinfo.comp_info[1];
        int cbx0 = lbx0 / 2, cby0 = lby0 / 2;
        int cbw = lbw / 2, cbh = lbh / 2;
        /* luma bounds use the MCU-padded grid ((w_in_blocks+1) & ~1):
         * the whole-image coefficient arrays are allocated rounded up to
         * the sampling factor and the decoder fills dummy edge blocks,
         * whose pixels the caller crops away. */
        if (lbx0 < 0 || lby0 < 0 || lbw <= 0 || lbh <= 0
            || (lbx0 | lby0 | lbw | lbh) & 1
            || lbx0 + lbw > (((int)c0->width_in_blocks + 1) & ~1)
            || lby0 + lbh > (((int)c0->height_in_blocks + 1) & ~1)
            || cbx0 + cbw > (int)c1->width_in_blocks
            || cby0 + cbh > (int)c1->height_in_blocks) {
            jpeg_destroy_decompress(&cinfo);
            return 8; /* window outside the block grid */
        }

        for (int ci = 0; ci < 3; ci++) {
            JQUANT_TBL *q =
                cinfo.quant_tbl_ptrs[cinfo.comp_info[ci].quant_tbl_no];
            if (q == NULL) {
                jpeg_destroy_decompress(&cinfo);
                return 9;
            }
            for (int k = 0; k < 64; k++)
                qt[ci * 64 + k] = (uint16_t)q->quantval[k];
        }

        for (int y = 0; y < lbh; y++) {
            JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
                (j_common_ptr)&cinfo, coefs[0],
                (JDIMENSION)(lby0 + y), 1, FALSE);
            memcpy(coefY + (size_t)y * lbw * DCTSIZE2,
                   rows[0][lbx0], (size_t)lbw * DCTSIZE2 * sizeof(JCOEF));
        }
        for (int y = 0; y < cbh; y++) {
            JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
                (j_common_ptr)&cinfo, coefs[1],
                (JDIMENSION)(cby0 + y), 1, FALSE);
            memcpy(coefCb + (size_t)y * cbw * DCTSIZE2,
                   rows[0][cbx0], (size_t)cbw * DCTSIZE2 * sizeof(JCOEF));
            rows = (*cinfo.mem->access_virt_barray)(
                (j_common_ptr)&cinfo, coefs[2],
                (JDIMENSION)(cby0 + y), 1, FALSE);
            memcpy(coefCr + (size_t)y * cbw * DCTSIZE2,
                   rows[0][cbx0], (size_t)cbw * DCTSIZE2 * sizeof(JCOEF));
        }
    }

    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
#undef src
}

/* Wrapper owning the suspension source (frees the truncated-stream
 * scratch buffer on every exit path, including longjmp errors). */
static int mej_read_coefs_region(const unsigned char *data,
                                 unsigned long size,
                                 int lbx0, int lby0, int lbw, int lbh,
                                 int exp_w, int exp_h,
                                 int16_t *coefY, int16_t *coefCb,
                                 int16_t *coefCr, uint16_t *qt /* [3*64] */)
{
    mej_chunk_src src;
    src.scratch = NULL;
    src.scratch_len = 0;
    int rc = mej_read_coefs_region_inner(
        data, size, lbx0, lby0, lbw, lbh, exp_w, exp_h,
        coefY, coefCb, coefCr, qt, &src);
    free(src.scratch);
    return rc;
}

/* Single-call variant from a file path (tests / probes). */
int mej_read_coefs_region_file(const char *path,
                               int lbx0, int lby0, int lbw, int lbh,
                               int exp_w, int exp_h,
                               int16_t *coefY, int16_t *coefCb,
                               int16_t *coefCr, uint16_t *qt)
{
    FILE *fp = fopen(path, "rb");
    if (!fp)
        return 10;
    fseek(fp, 0, SEEK_END);
    long sz = ftell(fp);
    fseek(fp, 0, SEEK_SET);
    if (sz <= 0) {
        fclose(fp);
        return 11;
    }
    unsigned char *buf = (unsigned char *)malloc((size_t)sz);
    if (!buf) {
        fclose(fp);
        return 12;
    }
    if (fread(buf, 1, (size_t)sz, fp) != (size_t)sz) {
        free(buf);
        fclose(fp);
        return 13;
    }
    fclose(fp);
    int rc = mej_read_coefs_region(buf, (unsigned long)sz,
                                   lbx0, lby0, lbw, lbh, exp_w, exp_h,
                                   coefY, coefCb, coefCr, qt);
    free(buf);
    return rc;
}

typedef struct {
    const unsigned char *const *datas;
    const unsigned long *sizes;
    int16_t *coefY;           /* N * lbh*lbw*64 */
    int16_t *coefCb;          /* N * (lbh/2)*(lbw/2)*64 */
    int16_t *coefCr;
    uint16_t *qt;             /* N * 3*64 */
    int *ok;                  /* N: 0 = success (else caller falls back) */
    int lbx0, lby0, lbw, lbh;
    int exp_w, exp_h;
    int n;
    int next;
    pthread_mutex_t lock;
} mej_coef_job;

static void *mej_coef_worker(void *arg)
{
    mej_coef_job *job = (mej_coef_job *)arg;
    size_t y_stride = (size_t)job->lbh * job->lbw * DCTSIZE2;
    size_t c_stride = y_stride / 4;
    for (;;) {
        pthread_mutex_lock(&job->lock);
        int i = job->next++;
        pthread_mutex_unlock(&job->lock);
        if (i >= job->n)
            break;
        job->ok[i] = mej_read_coefs_region(
            job->datas[i], job->sizes[i],
            job->lbx0, job->lby0, job->lbw, job->lbh,
            job->exp_w, job->exp_h,
            job->coefY + (size_t)i * y_stride,
            job->coefCb + (size_t)i * c_stride,
            job->coefCr + (size_t)i * c_stride,
            job->qt + (size_t)i * 3 * 64);
    }
    return NULL;
}

void mej_read_coefs_region_batch(const unsigned char *const *datas,
                                 const unsigned long *sizes, int n,
                                 int lbx0, int lby0, int lbw, int lbh,
                                 int exp_w, int exp_h,
                                 int16_t *coefY, int16_t *coefCb,
                                 int16_t *coefCr, uint16_t *qt,
                                 int *ok, int num_threads)
{
    mej_coef_job job;
    job.datas = datas;
    job.sizes = sizes;
    job.coefY = coefY;
    job.coefCb = coefCb;
    job.coefCr = coefCr;
    job.qt = qt;
    job.ok = ok;
    job.lbx0 = lbx0;
    job.lby0 = lby0;
    job.lbw = lbw;
    job.lbh = lbh;
    job.exp_w = exp_w;
    job.exp_h = exp_h;
    job.n = n;
    job.next = 0;
    pthread_mutex_init(&job.lock, NULL);

    if (num_threads < 1)
        num_threads = 1;
    if (num_threads > n)
        num_threads = n;
    pthread_t threads[64];
    if (num_threads > 64)
        num_threads = 64;

    for (int t = 0; t < num_threads; t++)
        pthread_create(&threads[t], NULL, mej_coef_worker, &job);
    for (int t = 0; t < num_threads; t++)
        pthread_join(threads[t], NULL);
    pthread_mutex_destroy(&job.lock);
}

/* ------------- raw-u8 region decode (minimal-byte H2D feed) ------------ */

/* Decode each region straight into its [rh, rw, 3] u8 BGR slot — no
 * temporary buffer and no packing: the minimal byte representation for
 * shipping crops over a narrow host->device link (device-side code
 * packs/pads into the staging layout on the accelerator). */
typedef struct {
    const unsigned char *const *datas;
    const unsigned long *sizes;
    unsigned char *out;       /* N * rh * rw * 3 */
    int *ok;                  /* N: 0 = success */
    int rx, ry, rw, rh;
    int n;
    const mej_opts *opts;
    int next;
    pthread_mutex_t lock;
} mej_u8_job;

static void *mej_u8_worker(void *arg)
{
    mej_u8_job *job = (mej_u8_job *)arg;
    size_t img_stride = (size_t)job->rw * job->rh * 3;
    for (;;) {
        pthread_mutex_lock(&job->lock);
        int i = job->next++;
        pthread_mutex_unlock(&job->lock);
        if (i >= job->n)
            break;
        int w, h;
        job->ok[i] = mej_decode_region(
            job->datas[i], job->sizes[i],
            job->out + (size_t)i * img_stride,
            job->rx, job->ry, job->rw, job->rh, &w, &h, job->opts);
    }
    return NULL;
}

void mej_decode_region_batch_u8(const unsigned char *const *datas,
                                const unsigned long *sizes, int n,
                                unsigned char *out,
                                int rx, int ry, int rw, int rh,
                                int *ok,
                                int dct_method, int fancy_upsampling,
                                int num_threads)
{
    mej_opts opts = {dct_method, fancy_upsampling, 1 /* BGR */};
    mej_u8_job job;
    job.datas = datas;
    job.sizes = sizes;
    job.out = out;
    job.ok = ok;
    job.rx = rx;
    job.ry = ry;
    job.rw = rw;
    job.rh = rh;
    job.n = n;
    job.opts = &opts;
    job.next = 0;
    pthread_mutex_init(&job.lock, NULL);

    if (num_threads < 1)
        num_threads = 1;
    if (num_threads > n)
        num_threads = n;
    pthread_t threads[64];
    if (num_threads > 64)
        num_threads = 64;

    for (int t = 0; t < num_threads; t++)
        pthread_create(&threads[t], NULL, mej_u8_worker, &job);
    for (int t = 0; t < num_threads; t++)
        pthread_join(threads[t], NULL);
    pthread_mutex_destroy(&job.lock);
}
