/* File-input shim for differential-testing against the reference decoder.
 *
 * The reference (TLeconte/vdlm2dec) has no file input (initFile /
 * runFileSample are dead declarations, vdlm2.h:110-111) and its main.c is
 * hard-wired to SDR hardware.  This shim — entirely our code — provides
 * main() plus the globals rtl.c/main.c would define, reads a cu8 capture
 * and replays it through the reference's own barrier pipeline so its
 * unmodified d8psk.c/vdlm2.c/out*.c sources decode it.
 *
 * Build (see build.sh): compiles /root/reference sources unmodified and
 * links this file in place of main.c/rtl.c.
 *
 * Usage: ref_shim <file.cu8> <Fc_Hz> <freq_MHz> [freq_MHz...] [flags...]
 *   flags: -J json, -G ground, -E empty, -U undecoded, -q quiet
 */
#define _GNU_SOURCE
#include <complex.h>
#include <pthread.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

#include "vdlm2.h"

/* globals normally owned by main.c / rtl.c */
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
int ppm = 0;

unsigned int SDRINRATE = 2000000;
unsigned int SDRCLK = 500;
unsigned int Fc;
complex float Cbuff[RTLINBUFSZ / 2];

int nbch;
thread_param_t tparam[MAXNBCHANNELS];
pthread_barrier_t Bar1, Bar2;

extern void build_label_filter(char *arg);

int main(int argc, char **argv)
{
    int n;
    logfd = stdout;
    if (argc < 4) {
        fprintf(stderr, "usage: %s file.cu8 Fc_Hz freqMHz... [-J -G -E -U -q]\n",
                argv[0]);
        return 1;
    }
    const char *path = argv[1];
    char *lblf = NULL;
    Fc = (unsigned int)strtoul(argv[2], NULL, 10);
    nbch = 0;
    for (n = 3; n < argc; n++) {
        if (argv[n][0] == '-') {
            switch (argv[n][1]) {
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
            tparam[nbch].Fo = fr - (int)Fc;
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

    unsigned char buf[RTLINBUFSZ];
    int flush_blocks = 8;     /* zero-fill tail so in-flight bursts finish */
    for (;;) {
        size_t got = fread(buf, 1, RTLINBUFSZ, fh);
        if (got < RTLINBUFSZ) {
            memset(buf + got, 127, RTLINBUFSZ - got);
            if (got == 0 && flush_blocks-- <= 0)
                break;
        }
        pthread_barrier_wait(&Bar1);
        for (int i = 0; i < RTLINBUFSZ; i += 2) {
            float r = (float)buf[i] - (float)127.37;
            float g = (float)buf[i + 1] - (float)127.37;
            Cbuff[i / 2] = r + g * I;
        }
        pthread_barrier_wait(&Bar2);
    }
    fclose(fh);
    stopVdlm2();
    fflush(logfd);
    /* rcv_threads are parked on the barrier; just exit */
    _exit(0);
}
