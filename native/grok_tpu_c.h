/* grok_tpu public C API.
 *
 * C ABI over the grok_tpu codec (reference parity: grok.h's codec objects,
 * ref-counted images, stream output callbacks and message handlers —
 * grok.h grk_object/grk_image/grk_stream_params/grk_msg_callback).
 * The implementation embeds the Python runtime on first use
 * (gktpu_initialize) or reuses the interpreter of a host Python process;
 * every call is GIL-safe and callable from any thread.
 *
 * Link against libgrok_tpu_c.so (built from native/capi.cpp; see
 * grok_tpu/capi.py for the build driver and the ctypes self-test).
 */
#ifndef GROK_TPU_C_H
#define GROK_TPU_C_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ---------------------------------------------------------- lifecycle */

/* Start (or attach to) the Python runtime and import the codec.
 * Returns 0 on success. Safe to call repeatedly. */
int gktpu_initialize(void);

/* Shut down the runtime IF this library started it (no-op when hosted
 * inside a Python process). */
void gktpu_deinitialize(void);

const char* gktpu_version(void);

/* Last error message for the calling thread ("" if none). */
const char* gktpu_last_error(void);

/* ------------------------------------------------------ message hooks */

typedef void (*gktpu_msg_fn)(const char* msg, void* user);

/* Route codec info/warn/error messages to C callbacks (any may be NULL).
 * Mirrors grok.h's grk_set_msg_handlers. */
int gktpu_set_msg_handlers(gktpu_msg_fn info, gktpu_msg_fn warn,
                           gktpu_msg_fn error, void* user);

/* ------------------------------------------------------- image object */

/* Ref-counted planar image (parity: grk_image + grk_object_ref/unref). */
typedef struct gktpu_image gktpu_image;

/* Create an image; comp planes are zero-initialised int32 buffers of
 * width*height (row-major). prec <= 16, sgnd in {0,1}. NULL on error. */
gktpu_image* gktpu_image_create(uint32_t width, uint32_t height,
                                uint32_t num_comps, uint32_t prec,
                                int32_t sgnd);

void gktpu_image_ref(gktpu_image* img);
void gktpu_image_unref(gktpu_image* img);

uint32_t gktpu_image_width(const gktpu_image* img);
uint32_t gktpu_image_height(const gktpu_image* img);
uint32_t gktpu_image_num_comps(const gktpu_image* img);
uint32_t gktpu_image_prec(const gktpu_image* img);
int32_t gktpu_image_sgnd(const gktpu_image* img);

/* Writable plane pointer (width*height int32), NULL if comp out of range. */
int32_t* gktpu_image_comp_data(gktpu_image* img, uint32_t comp);

/* --------------------------------------------------------- parameters */

typedef struct {
    uint32_t num_resolutions; /* 0 -> 6 */
    uint32_t cblk_w, cblk_h;  /* 0 -> 64 */
    int32_t irreversible;     /* 1 -> 9/7 + ICT */
    int32_t ht;               /* 1 -> HTJ2K (block coder swap) */
    int32_t mct;              /* -1 auto, 0 off, 1 on */
    uint32_t num_layers;      /* 0 -> 1 */
    double layer_rates[16];   /* compression ratios per layer */
    char progression[8];      /* "LRCP".."CPRL"; "" -> LRCP */
    uint32_t tile_w, tile_h;  /* 0 -> single tile */
    int32_t jp2;              /* 1 -> wrap in JP2 container */
    uint32_t cblk_style;      /* T.800 Table A-19 mode switches */
} gktpu_cparams;

typedef struct {
    uint32_t reduce;     /* discard this many highest resolutions */
    int32_t layers;      /* decode at most N layers (0 = all) */
    int32_t tile;        /* decode only this tile (-1 = all) */
    uint32_t win_x0, win_y0, win_x1, win_y1; /* region; all 0 = full */
} gktpu_dparams;

void gktpu_cparams_default(gktpu_cparams* p);
void gktpu_dparams_default(gktpu_dparams* p);

/* ------------------------------------------------------------- codecs */

/* Compress into a malloc'd buffer (*out, *out_len); caller frees with
 * gktpu_free. Returns 0 on success. */
int gktpu_compress(const gktpu_image* img, const gktpu_cparams* params,
                   uint8_t** out, size_t* out_len);

/* Compress with a streaming output callback (parity: grok.h
 * grk_stream_params write callbacks). The callback returns the number of
 * bytes it consumed; short writes abort with an error. */
typedef size_t (*gktpu_write_fn)(const uint8_t* data, size_t len, void* user);
int gktpu_compress_stream(const gktpu_image* img, const gktpu_cparams* params,
                          gktpu_write_fn write, void* user);

/* Decompress a codestream (J2K or JP2) into a new image (caller unrefs).
 * NULL on error (see gktpu_last_error). */
gktpu_image* gktpu_decompress(const uint8_t* data, size_t len,
                              const gktpu_dparams* params);

void gktpu_free(void* p);

#ifdef __cplusplus
}
#endif

#endif /* GROK_TPU_C_H */
