/* Minimal libjpeg shim for gdal_ray (production JPEG decode path).
 *
 * The reference links libjpeg directly (frmts/jpeg/); this shim exposes
 * the same library through three flat C entry points so Python can call
 * it via ctypes (the classic IJG API needs setjmp error recovery, which
 * ctypes cannot express — hence ~60 lines of C instead of a binding).
 *
 * Built on demand by gdal_ray/_native/__init__.py with:
 *   gcc -O2 -shared -fPIC jpegshim.c -o libgrjpeg.so -ljpeg
 *
 * All functions return 0 on success, -1 on any libjpeg error (message
 * copied into errmsg, >= 200 bytes).  Pixel layout: packed row-major
 * RGB (ch=3) or grayscale (ch=1), matching the from-spec decoder in
 * gdal_ray/codecs/jpeg.py.  CMYK/YCCK sources are reported as errors so
 * the caller falls back to the from-spec path.
 */
#include <setjmp.h>
#include <stddef.h>
#include <string.h>
#include <stdio.h>
#include <jpeglib.h>

struct gr_err {
    struct jpeg_error_mgr pub;
    jmp_buf jb;
    char *msg;
};

static void gr_error_exit(j_common_ptr cinfo)
{
    struct gr_err *e = (struct gr_err *)cinfo->err;
    if (e->msg)
        (*cinfo->err->format_message)(cinfo, e->msg);
    longjmp(e->jb, 1);
}

static void gr_silent(j_common_ptr cinfo, int msg_level)
{
    (void)cinfo;
    (void)msg_level;
}

int gr_jpeg_header(const unsigned char *buf, size_t n,
                   int *w, int *h, int *ch, char *errmsg)
{
    struct jpeg_decompress_struct c;
    struct gr_err e;
    c.err = jpeg_std_error(&e.pub);
    e.pub.error_exit = gr_error_exit;
    e.pub.emit_message = gr_silent;
    e.msg = errmsg;
    if (setjmp(e.jb)) {
        jpeg_destroy_decompress(&c);
        return -1;
    }
    jpeg_create_decompress(&c);
    jpeg_mem_src(&c, buf, (unsigned long)n);
    jpeg_read_header(&c, TRUE);
    *w = (int)c.image_width;
    *h = (int)c.image_height;
    *ch = c.num_components == 1 ? 1 : 3;
    jpeg_destroy_decompress(&c);
    return 0;
}

int gr_jpeg_decode(const unsigned char *buf, size_t n,
                   unsigned char *out, size_t outcap,
                   int *w, int *h, int *ch, char *errmsg)
{
    struct jpeg_decompress_struct c;
    struct gr_err e;
    size_t stride;
    c.err = jpeg_std_error(&e.pub);
    e.pub.error_exit = gr_error_exit;
    e.pub.emit_message = gr_silent;
    e.msg = errmsg;
    if (setjmp(e.jb)) {
        jpeg_destroy_decompress(&c);
        return -1;
    }
    jpeg_create_decompress(&c);
    jpeg_mem_src(&c, buf, (unsigned long)n);
    jpeg_read_header(&c, TRUE);
    if (c.jpeg_color_space == JCS_CMYK || c.jpeg_color_space == JCS_YCCK) {
        snprintf(errmsg, 200, "CMYK/YCCK unsupported in shim");
        jpeg_destroy_decompress(&c);
        return -1;
    }
    c.out_color_space = c.num_components == 1 ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_start_decompress(&c);
    *w = (int)c.output_width;
    *h = (int)c.output_height;
    *ch = (int)c.output_components;
    stride = (size_t)c.output_width * c.output_components;
    if (stride * c.output_height > outcap) {
        snprintf(errmsg, 200, "output buffer too small");
        jpeg_destroy_decompress(&c);
        return -1;
    }
    while (c.output_scanline < c.output_height) {
        JSAMPROW row = out + (size_t)c.output_scanline * stride;
        jpeg_read_scanlines(&c, &row, 1);
    }
    jpeg_finish_decompress(&c);
    jpeg_destroy_decompress(&c);
    return 0;
}

int gr_jpeg_encode(const unsigned char *rgb, int w, int h, int ch,
                   int quality, unsigned char **outbuf,
                   unsigned long *outlen, char *errmsg)
{
    struct jpeg_compress_struct c;
    struct gr_err e;
    size_t stride = (size_t)w * ch;
    c.err = jpeg_std_error(&e.pub);
    e.pub.error_exit = gr_error_exit;
    e.pub.emit_message = gr_silent;
    e.msg = errmsg;
    *outbuf = NULL;
    *outlen = 0;
    if (setjmp(e.jb)) {
        jpeg_destroy_compress(&c);
        return -1;
    }
    jpeg_create_compress(&c);
    jpeg_mem_dest(&c, outbuf, outlen);
    c.image_width = (JDIMENSION)w;
    c.image_height = (JDIMENSION)h;
    c.input_components = ch;
    c.in_color_space = ch == 1 ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&c);
    jpeg_set_quality(&c, quality, TRUE);
    jpeg_start_compress(&c, TRUE);
    while (c.next_scanline < c.image_height) {
        JSAMPROW row = (JSAMPROW)(rgb + (size_t)c.next_scanline * stride);
        jpeg_write_scanlines(&c, &row, 1);
    }
    jpeg_finish_compress(&c);
    jpeg_destroy_compress(&c);
    return 0;
}

void gr_free(void *p)
{
    free(p);
}
