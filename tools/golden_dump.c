/*
 * golden_dump.c - Render an .a2s program offline with the reference
 * Audiality 2 engine (built from /root/reference) and dump raw PCM.
 *
 * This is OUR tool (not reference code); it only uses the public API, the
 * same way a2play does (a2play.c:729 sink callback pattern), to produce
 * golden outputs for parity testing of the TPU rebuild.
 *
 * Usage: golden_dump <file.a2s> <program> <seconds> <samplerate> <out.raw>
 *                    [arg0 arg1 ...]
 * Output: raw int32 (8:24 fixed point) mono little-endian frames.
 * Set GOLDEN_CHANNELS=2 for stereo (frame-interleaved L R).
 *
 * GOLDEN_SEND="frames:ep:a0:a1:a2:a3;..." sends timestamped 4-arg
 * messages to the started voice (absolute frame positions, args as
 * decimal -> 16:16) before running — used to drive MIDI-handler
 * programs (entry point 7, a2_drivers.h MIDI contract)
 * deterministically for render-parity goldens (e.g. miditest2.a2s).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "audiality2.h"

static FILE *outf;

static A2_errors sink_process(int **buffers, unsigned nbuffers,
		unsigned frames, void *userdata)
{
	/* NOTE: Also called with no buffers on client removal (a2_Close)! */
	if(!buffers || !nbuffers || !frames)
		return A2_OK;
	if(nbuffers == 1)
		fwrite(buffers[0], sizeof(int), frames, outf);
	else
	{
		unsigned f, c;
		for(f = 0; f < frames; ++f)
			for(c = 0; c < nbuffers; ++c)
				fwrite(&buffers[c][f], sizeof(int), 1, outf);
	}
	return A2_OK;
}

int main(int argc, char *argv[])
{
	A2_interface *iface;
	A2_config *cfg;
	A2_handle module, prog, vh;
	int a[8];
	int an = 0;
	int i;
	double seconds;
	int samplerate, frames;
	if(argc < 6)
	{
		fprintf(stderr, "usage: %s <file.a2s> <prog> <sec> <rate> "
				"<out.raw> [args...]\n", argv[0]);
		return 1;
	}
	seconds = atof(argv[3]);
	samplerate = atoi(argv[4]);
	if(!(outf = fopen(argv[5], "wb")))
		return 2;
	for(i = 6; i < argc && an < 8; ++i)
		a[an++] = (int)(atof(argv[i]) * 65536.0);
	{
		const char *ch = getenv("GOLDEN_CHANNELS");
		cfg = a2_OpenConfig(samplerate, 4096, ch ? atoi(ch) : 1,
				A2_TIMESTAMP | A2_AUTOCLOSE);
	}
	if(!cfg)
		return 3;
	if(a2_AddDriver(cfg, a2_NewDriver(A2_AUDIODRIVER, "buffer")))
		return 4;
	if(!(iface = a2_Open(cfg)))
		return 5;
	if((module = a2_Load(iface, argv[1], 0)) < 0)
	{
		fprintf(stderr, "load: %s\n", a2_ErrorString(-module));
		return 6;
	}
	if((prog = a2_Get(iface, module, argv[2])) < 0)
	{
		fprintf(stderr, "get: %s\n", a2_ErrorString(-prog));
		return 7;
	}
	a2_TimestampReset(iface);
	if(a2_SinkCallback(iface, a2_RootVoice(iface), sink_process, NULL) < 0)
		return 8;
	vh = a2_Starta(iface, a2_RootVoice(iface), prog, an, an ? a : NULL);
	if(vh < 0)
	{
		fprintf(stderr, "start: %s\n", a2_ErrorString(-vh));
		return 9;
	}
	{
		const char *ev = getenv("GOLDEN_SEND");
		if(ev)
		{
			char *s = strdup(ev);
			char *save = NULL;
			char *tok = strtok_r(s, ";", &save);
			int prev = 0;
			while(tok)
			{
				int tf = 0, ep = 0;
				double d0 = 0, d1 = 0, d2 = 0, d3 = 0;
				int av[4];
				sscanf(tok, "%d:%d:%lf:%lf:%lf:%lf",
						&tf, &ep, &d0, &d1, &d2, &d3);
				av[0] = (int)(d0 * 65536.0);
				av[1] = (int)(d1 * 65536.0);
				av[2] = (int)(d2 * 65536.0);
				av[3] = (int)(d3 * 65536.0);
				a2_TimestampBump(iface, (tf - prev) << 8);
				prev = tf;
				a2_Senda(iface, vh, ep, 4, av);
				tok = strtok_r(NULL, ";", &save);
			}
			free(s);
		}
	}
	frames = (int)(seconds * samplerate);
	{
		const char *cs = getenv("GOLDEN_CHUNK");
		int chunk = cs ? atoi(cs) : 4096;
		while(frames > 0)
		{
			a2_Run(iface, chunk);
			a2_PumpMessages(iface);
			frames -= chunk;
		}
	}
	fclose(outf);
	a2_Close(iface);
	return 0;
}
