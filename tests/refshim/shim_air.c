/* Airspy-mode file-input shim: like shim.c but WITH_AIR semantics —
 * float32 real samples at 6 Msps (SDRCLK 1500), channels mixed relative to
 * F0 = Fc + SDRINRATE/4 (air.c:182-185).  Our code; reference sources
 * compiled unmodified.
 *
 * Usage: ref_shim_air <file.f32> <Fc_Hz> <freq_MHz>... [-J -G -E -U -q]
 *                     [-r5000000]
 * -r selects the airspy rate (6000000 Mini default / 5000000 R2,
 * air.c:130-141 sets SDRINRATE+SDRCLK from the device's rate list).
 */
#define _GNU_SOURCE
#include <complex.h>
#include <pthread.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

#include "vdlm2.h"

int verbose = 1;
int grndmess = 0;
int emptymess = 0;
int undecmess = 0;
int jsonout = 0;
int routeout = 0;
int regout = 0;
char *netOutJsonAddr = NULL;
char *netOutSbsAddr = NULL;
char *idstation = "refshim";
FILE *logfd;
int gain = 0;

unsigned int SDRINRATE = 6000000;
unsigned int SDRCLK = 1500;
unsigned int Fc;
float Cbuff[RTLINBUFSZ / 2];

int nbch;
thread_param_t tparam[MAXNBCHANNELS];
pthread_barrier_t Bar1, Bar2;

extern void build_label_filter(char *arg);

int main(int argc, char **argv)
{
    int n;
    logfd = stdout;
    if (argc < 4) {
        fprintf(stderr, "usage: %s file.f32 Fc_Hz freqMHz... [flags]\n", argv[0]);
        return 1;
    }
    const char *path = argv[1];
    char *lblf = NULL;
    Fc = (unsigned int)strtoul(argv[2], NULL, 10);
    /* rate first: F0 and the per-channel Fo depend on it (air.c:182) */
    for (n = 3; n < argc; n++) {
        if (argv[n][0] == '-' && argv[n][1] == 'r') {
            SDRINRATE = (unsigned int)strtoul(argv[n] + 2, NULL, 10);
            SDRCLK = SDRINRATE / 4000;   /* air.c:138 */
        }
    }
    unsigned int F0 = Fc + SDRINRATE / 4;
    nbch = 0;
    for (n = 3; n < argc; n++) {
        if (argv[n][0] == '-') {
            switch (argv[n][1]) {
            case 'r': break;             /* handled above */
            case 'J': jsonout = 1; verbose = 0; break;
            case 'R': routeout = 1; jsonout = 1; verbose = 0; break;
            case 'a': regout = 1; jsonout = 0; verbose = 0; break;
            case 'G': grndmess = 1; break;
            case 'E': emptymess = 1; break;
            case 'U': undecmess = 1; break;
            case 'q': verbose = 0; break;
            case 'v': verbose = 2; break;
            case 'b': lblf = argv[n] + 2; break;
            case 's': netOutSbsAddr = argv[n] + 2; break;
            }
            continue;
        }
        if (nbch < MAXNBCHANNELS) {
            int fr = (int)(1000000.0 * atof(argv[n]));
            tparam[nbch].chn = nbch;
            tparam[nbch].Fr = fr;
            tparam[nbch].Fo = fr - (int)F0;
            nbch++;
        }
    }
    build_label_filter(lblf);

    FILE *fh = fopen(path, "rb");
    if (!fh) { perror("open"); return 1; }

    pthread_barrier_init(&Bar1, NULL, nbch + 1);
    pthread_barrier_init(&Bar2, NULL, nbch + 1);
    for (n = 0; n < nbch; n++) {
        pthread_t th;
        pthread_create(&th, NULL, rcv_thread, &(tparam[n]));
    }

    static float tmp[RTLINBUFSZ / 2];
    int flush_blocks = 16;
    for (;;) {
        size_t got = fread(tmp, sizeof(float), RTLINBUFSZ / 2, fh);
        if (got < RTLINBUFSZ / 2) {
            memset(tmp + got, 0, (RTLINBUFSZ / 2 - got) * sizeof(float));
            if (got == 0 && flush_blocks-- <= 0)
                break;
        }
        /* producer fills Cbuff only between Bar1 and Bar2 (air.c:203-211) */
        pthread_barrier_wait(&Bar1);
        memcpy(Cbuff, tmp, sizeof(Cbuff));
        pthread_barrier_wait(&Bar2);
    }
    fclose(fh);
    stopVdlm2();
    fflush(logfd);
    _exit(0);
}
