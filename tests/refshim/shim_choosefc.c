/* Front-end pure-logic differential shim: compiles the UNMODIFIED
 * reference rtl.c / air.c against stub SDR libs (fakeinc/) and prints the
 * hardware-independent outcomes so io/sdr.py can be differential-tested:
 *   - rtl mode:   chooseFc (rtl.c:123-160), nearest_gain (rtl.c:162-184),
 *                 per-channel mixer offsets (rtl.c:245-247)
 *   - air mode:   chooseFc incl. the R820T2 IF-filter offset and register
 *                 writes for the 5 Msps R2 (air.c:44-70), rate selection
 *                 (air.c:130-141), fs/4 mixer offsets (air.c:182-185)
 *
 * Usage:
 *   shim_choosefc_rtl <gain_tenths> <ppm> <freqMHz>...
 *   shim_choosefc_air <rate_hz> <freqMHz>...
 * Output lines: FC <hz> / GAIN <tenths> / R820T <reg> <val> / FO <chn> <off>
 */
#define _GNU_SOURCE
#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

int verbose = 0;
int nbch;
int gain = 1000;
int ppm = 0;
pthread_barrier_t Bar1, Bar2;
uint64_t airspy_serial = 0;

#ifdef SHIM_RTL
#include <rtl-sdr.h>

/* ---- stub librtlsdr: one fake device, records settings ---- */
static int recorded_gain = -1;
/* the R820T's real gain table (librtlsdr r82xx.c), in tenths of dB */
static const int fake_gains[] = {0, 9, 14, 27, 37, 77, 87, 125, 144, 157,
                                 166, 197, 207, 229, 254, 280, 297, 328,
                                 338, 364, 372, 386, 402, 421, 434, 439,
                                 445, 480, 496};
uint32_t rtlsdr_get_device_count(void) { return 1; }
const char *rtlsdr_get_device_name(uint32_t i) { (void)i; return "fake"; }
int rtlsdr_get_device_usb_strings(uint32_t i, char *m, char *p, char *s)
{ (void)i; strcpy(m, "fake"); strcpy(p, "fake"); strcpy(s, "00000001");
  return 0; }
int rtlsdr_open(rtlsdr_dev_t **dev, uint32_t i)
{ (void)i; *dev = (rtlsdr_dev_t *)1; return 0; }
int rtlsdr_set_tuner_gain_mode(rtlsdr_dev_t *d, int m)
{ (void)d; (void)m; return 0; }
int rtlsdr_set_tuner_gain(rtlsdr_dev_t *d, int g)
{ (void)d; recorded_gain = g; return 0; }
int rtlsdr_get_tuner_gains(rtlsdr_dev_t *d, int *g)
{ (void)d;
  if (g) memcpy(g, fake_gains, sizeof(fake_gains));
  return sizeof(fake_gains) / sizeof(fake_gains[0]); }
int rtlsdr_set_freq_correction(rtlsdr_dev_t *d, int p)
{ (void)d; (void)p; return 0; }
int rtlsdr_set_center_freq(rtlsdr_dev_t *d, uint32_t f)
{ (void)d; (void)f; return 0; }
int rtlsdr_set_sample_rate(rtlsdr_dev_t *d, uint32_t r)
{ (void)d; (void)r; return 0; }
int rtlsdr_reset_buffer(rtlsdr_dev_t *d) { (void)d; return 0; }
int rtlsdr_read_async(rtlsdr_dev_t *d, rtlsdr_read_async_cb_t cb, void *c,
                      uint32_t n, uint32_t l)
{ (void)d; (void)cb; (void)c; (void)n; (void)l; return 0; }

#include "rtl.c"                 /* unmodified reference source */

int main(int argc, char **argv)
{
    if (argc < 4) {
        fprintf(stderr, "usage: %s gain ppm freqMHz...\n", argv[0]);
        return 2;
    }
    gain = atoi(argv[1]);
    ppm = atoi(argv[2]);
    char *fake_argv[64];
    int n = 0;
    fake_argv[n++] = "0";                  /* device index */
    for (int i = 3; i < argc && n < 63; i++)
        fake_argv[n++] = argv[i];
    fake_argv[n] = NULL;
    thread_param_t param[MAXNBCHANNELS];
    if (initRtl(fake_argv, 0, param) != 0)
        return 1;
    printf("FC %u\n", Fc);
    printf("GAIN %d\n", recorded_gain);
    for (int i = 0; i < nbch; i++)
        printf("FO %d %d\n", param[i].chn, param[i].Fo);
    return 0;
}
#endif

#ifdef SHIM_AIR
#include <libairspy/airspy.h>

static uint32_t fake_rate = 6000000;
static int reg_writes[2][2];
static int n_reg = 0;
int airspy_open_sn(struct airspy_device **d, uint64_t s)
{ (void)s; *d = (struct airspy_device *)1; return 0; }
int airspy_open(struct airspy_device **d)
{ *d = (struct airspy_device *)1; return 0; }
int airspy_close(struct airspy_device *d) { (void)d; return 0; }
int airspy_exit(void) { return 0; }
const char *airspy_error_name(enum airspy_error e) { (void)e; return "err"; }
int airspy_set_sample_type(struct airspy_device *d, enum airspy_sample_type t)
{ (void)d; (void)t; return 0; }
int airspy_get_samplerates(struct airspy_device *d, uint32_t *buf,
                           const uint32_t len)
{ (void)d;
  if (len == 0) { *buf = 1; return 0; }
  buf[0] = fake_rate; return 0; }
int airspy_set_samplerate(struct airspy_device *d, uint32_t r)
{ (void)d; (void)r; return 0; }
int airspy_set_packing(struct airspy_device *d, uint8_t v)
{ (void)d; (void)v; return 0; }
int airspy_set_linearity_gain(struct airspy_device *d, uint8_t v)
{ (void)d; (void)v; return 0; }
int airspy_set_freq(struct airspy_device *d, const uint32_t f)
{ (void)d; (void)f; return 0; }
int airspy_start_rx(struct airspy_device *d, airspy_sample_block_cb_fn cb,
                    void *c)
{ (void)d; (void)cb; (void)c; return 0; }
int airspy_is_streaming(struct airspy_device *d) { (void)d; return 0; }
int airspy_r820t_write(struct airspy_device *d, uint8_t reg, uint8_t val)
{ (void)d;
  if (n_reg < 2) { reg_writes[n_reg][0] = reg; reg_writes[n_reg][1] = val; }
  n_reg++; return 0; }

#include "air.c"                 /* unmodified reference source */

int main(int argc, char **argv)
{
    if (argc < 3) {
        fprintf(stderr, "usage: %s rate_hz freqMHz...\n", argv[0]);
        return 2;
    }
    fake_rate = (uint32_t)strtoul(argv[1], NULL, 10);
    char *fake_argv[64];
    int n = 0;
    for (int i = 2; i < argc && n < 63; i++)
        fake_argv[n++] = argv[i];
    fake_argv[n] = NULL;
    thread_param_t param[MAXNBCHANNELS];
    if (initAirspy(fake_argv, 0, param) != 0)
        return 1;
    printf("FC %u\n", Fc);
    printf("RATE %u\n", SDRINRATE);
    for (int i = 0; i < n_reg && i < 2; i++)
        printf("R820T %d %d\n", reg_writes[i][0], reg_writes[i][1]);
    for (int i = 0; i < nbch; i++)
        printf("FO %d %d\n", param[i].chn, param[i].Fo);
    return 0;
}
#endif
