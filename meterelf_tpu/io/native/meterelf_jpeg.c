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
